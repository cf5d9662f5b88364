"""Similarity search over the embeddings table: brute-force cosine top-k
(the exactness baseline) and an IVF-bucketed variant (the scale path).

Brute force streams the CORPUS and broadcasts the QUERIES (the reverse of
round 1's shape): each map_batches task scores its corpus block against the
tiny query matrix and emits its per-block top-k; a final per-query reduce
merges block candidates. The full embedding matrix is never materialized on
the driver or broadcast — corpus blocks stay zero-copy in the object store.

IVF: coarse centroids are trained on a bounded sample (driver-side numpy
over ≤``SAMPLE_ROWS`` rows — constant, not corpus-sized), broadcast once;
assignment runs as a distributed map_batches; vectors land in
bucket-partitioned Parquet under /tmp, and queries read ONLY their
``n_probe`` nearest buckets back (path-pruned scan). Recall vs the brute
baseline is test-covered; at the registered probe width the result is
empirically exact at bench scale, which is what the driver oracle checks.
"""

from __future__ import annotations
from fundamental_ray.sources.parquet import read_parquet_clean
from fundamental_ray.state.diskcache import cache_valid, mark_done, source_fingerprint

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SAMPLE_ROWS = 4096


def _query_matrix(sf_dir: str, n_queries: int):
    """The (tiny) query-side read: first n_queries vec_ids."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    emb = (
        read_parquet_clean(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filter=pc.less(pads.field("vec_id"), n_queries),
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    q = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    qn = q / np.clip(np.linalg.norm(q, axis=1, keepdims=True), 1e-30, None)
    return emb["vec_id"].to_numpy(), qn


def _block_topk(qids: np.ndarray, qm: np.ndarray, ids: np.ndarray, mat: np.ndarray, k: int):
    """Top-k rows of one corpus block against every query (vectorized)."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    matn = mat / np.clip(norms, 1e-30, None)
    sims = qm @ matn.T  # (Q, block)
    out = {"query_id": [], "neighbor_id": [], "cosine": []}
    kk = min(k, sims.shape[1])
    for qi, qid in enumerate(qids):
        row = sims[qi].copy()
        self_mask = ids == qid
        row[self_mask] = -np.inf  # exclude self
        sel = np.lexsort((ids, -row))[:kk]
        for j in sel:
            if row[j] == -np.inf:
                continue
            out["query_id"].append(int(qid))
            out["neighbor_id"].append(int(ids[j]))
            out["cosine"].append(float(row[j]))
    return pd.DataFrame(out)


def _merge_topk(ds: ray.data.Dataset, k: int) -> pd.DataFrame:
    """Per-query reduce of block candidates (k × n_blocks rows — small)."""

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = g["cosine"].round(4)
        return g[["query_id", "neighbor_id", "rank", "cosine"]]

    return (
        ds.groupby("query_id")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def brute_force_topk(sf_dir: str, k: int = 10, n_queries: int = 5) -> pd.DataFrame:
    """Top-k cosine neighbors (excluding self) for the first ``n_queries``
    vec_ids; deterministic tiebreak (sim desc, neighbor vec_id asc)."""
    import ray

    qids, qm = _query_matrix(sf_dir, n_queries)
    qref = ray.put((qids, qm))

    def block(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy()
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        bq, bm = ray.get(qref)
        return _block_topk(bq, bm, ids, mat, k)

    cand = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(block, batch_format="pandas", batch_size=1024)
    return _merge_topk(cand, k)


def brute_force_topk_sql(k: int = 10, n_queries: int = 5) -> str:
    return f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {n_queries}),
sims AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cos_raw
  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank, ROUND(cos_raw, 4) AS cosine
FROM ranked WHERE rank <= {k}
"""


def _train_centroids(sf_dir: str, n_centroids: int) -> np.ndarray:
    """Deterministic coarse centroids from a BOUNDED sample: evenly-strided
    seeds + one Lloyd sweep (no RNG, no wall-clock). Sample size is a
    constant — this is the only driver-side numpy in the IVF path."""
    sample = (
        read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .limit(SAMPLE_ROWS)
        .to_pandas()
        .sort_values("vec_id")
    )
    mat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30, None)
    stride = max(1, len(matn) // n_centroids)
    cents = matn[::stride][:n_centroids].copy()
    assign = np.argmax(matn @ cents.T, axis=1)
    for c in range(len(cents)):
        members = matn[assign == c]
        if len(members):
            v = members.mean(axis=0)
            cents[c] = v / max(np.linalg.norm(v), 1e-30)
    return cents


def build_ivf_index(sf_dir: str, n_centroids: int = 16) -> tuple[str, np.ndarray]:
    """Distributed IVF build: broadcast centroids; map_batches assigns each
    vector to its nearest centroid; bucket-partitioned Parquet write so a
    query's probe reads only its buckets. Idempotent per (corpus, params)."""
    import pyarrow as pa
    import ray

    cents = _train_centroids(sf_dir, n_centroids)
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/fr_ivf/{tag}-c{n_centroids}-v1"
    fp = source_fingerprint(f"{sf_dir}/embeddings.parquet", extra=f"c{n_centroids}-v1")
    if cache_valid(out, fp):
        return out, cents
    os.makedirs(out, exist_ok=True)
    cref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        C = ray.get(cref)
        mat = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
        matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30, None)
        bucket = np.argmax(matn @ C.T, axis=1).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket, pa.int32()))

    (
        read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow", batch_size=2048)
        .write_parquet(out, partition_cols=["bucket"])
    )
    mark_done(out, fp)
    return out, cents


def ivf_topk(
    sf_dir: str, k: int = 10, n_queries: int = 5,
    n_centroids: int = 16, n_probe: int = 8,
) -> pd.DataFrame:
    """IVF approximate top-k: probe the n_probe nearest buckets per query,
    reading ONLY those buckets' Parquet partitions. Same output schema as
    brute_force_topk. At the default probe width the sf-scale result is
    empirically identical to brute force (asserted by the driver oracle);
    narrower probes trade recall for reads (test-covered)."""
    import glob as _glob

    import ray

    index_dir, cents = build_ivf_index(sf_dir, n_centroids)
    qids, qm = _query_matrix(sf_dir, n_queries)

    # per-query probe list → read each needed bucket once, score against
    # only the queries probing it
    probes = np.argsort(-(qm @ cents.T), axis=1)[:, :n_probe]  # (Q, n_probe)
    by_bucket: dict[int, list[int]] = {}
    for qi, row in enumerate(probes):
        for b in row:
            by_bucket.setdefault(int(b), []).append(qi)
    qref = ray.put((qids, qm))

    cand_frames = []
    paths, path_queries = [], []
    for b, q_idx in sorted(by_bucket.items()):
        bucket_files = sorted(_glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet")))
        if bucket_files:
            paths.append(bucket_files)
            path_queries.append(q_idx)

    @ray.remote(num_cpus=1)
    def score_bucket(files: list[str], q_idx: list[int], qref):
        import pyarrow.parquet as pq

        qids_all, qm_all = qref  # top-level ObjectRef arg — Ray auto-derefs
        t = pq.read_table(files, columns=["vec_id", "embedding"])
        ids = t.column("vec_id").to_numpy()
        mat = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
        sel = np.array(q_idx, dtype=np.int64)
        return _block_topk(qids_all[sel], qm_all[sel], ids, mat, k)

    refs = [score_bucket.remote(f, q, qref) for f, q in zip(paths, path_queries)]
    cand_frames = [f for f in ray.get(refs) if len(f)]
    if not cand_frames:
        return pd.DataFrame(
            {"query_id": [], "neighbor_id": [], "rank": [], "cosine": []}
        ).astype({"query_id": "int64", "neighbor_id": "int64", "rank": "int64",
                  "cosine": "float64"})
    cand = ray.data.from_pandas(pd.concat(cand_frames, ignore_index=True))
    return _merge_topk(cand, k)


# ---------------------------------------------------------------- LSH path
LSH_PLANES = 6   # bits per table → 2^6 = 64 buckets
LSH_TABLES = 8   # independent tables (OR-amplification)
LSH_RADIUS = 2   # multiprobe Hamming radius around the query signature
# registered width (8 tables × radius-2 multiprobe = 22 of 64 buckets per
# table) is the narrowest that is brute-exact at driver scale; recall at
# narrower widths is measured in tests/test_corpus_stats.py


def _lsh_planes(dim: int, n_tables: int, n_planes: int) -> np.ndarray:
    """Deterministic random hyperplanes (fixed seed — index build and
    query side must agree, and re-runs must be reproducible)."""
    rs = np.random.RandomState(0xF17A)
    return rs.standard_normal((n_tables, n_planes, dim))


def _signatures(matn: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(rows, tables) int signatures: sign-bit pattern of the projections."""
    n_tables, n_planes, _ = planes.shape
    sigs = np.zeros((matn.shape[0], n_tables), dtype=np.int32)
    for t in range(n_tables):
        bits = (matn @ planes[t].T) >= 0  # (rows, planes)
        sigs[:, t] = bits @ (1 << np.arange(n_planes))
    return sigs


def build_lsh_index(
    sf_dir: str, n_tables: int = LSH_TABLES, n_planes: int = LSH_PLANES
) -> tuple[str, np.ndarray]:
    """Distributed LSH build (the random-hyperplane twin of the IVF index):
    broadcast the plane tensor, map_batches signs each vector into one
    bucket PER TABLE, bucket-partitioned Parquet write under
    ``table=T/bucket=B`` so a query's multiprobe reads only its probed
    partitions. Storage is n_tables × corpus (the classic LSH trade)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    first = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    ).slice(0, 1)
    dim = len(first.column("embedding")[0])
    planes = _lsh_planes(dim, n_tables, n_planes)
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/fr_lsh/{tag}-t{n_tables}-p{n_planes}-v1"
    fp = source_fingerprint(
        f"{sf_dir}/embeddings.parquet", extra=f"t{n_tables}-p{n_planes}-v1"
    )
    if cache_valid(out, fp):
        return out, planes
    os.makedirs(out, exist_ok=True)
    pref = ray.put(planes)

    def assign(t: pa.Table) -> pa.Table:
        P = ray.get(pref)
        mat = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
        matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30, None)
        sigs = _signatures(matn, P)  # (rows, tables)
        parts = []
        for ti in range(P.shape[0]):
            parts.append(
                pa.table(
                    {
                        "vec_id": t.column("vec_id"),
                        "embedding": t.column("embedding"),
                        "table": pa.array(
                            np.full(t.num_rows, ti, dtype=np.int32)
                        ),
                        "bucket": pa.array(sigs[:, ti], pa.int32()),
                    }
                )
            )
        return pa.concat_tables(parts)

    (
        read_parquet_clean(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(assign, batch_format="pyarrow", batch_size=2048)
        .write_parquet(out, partition_cols=["table", "bucket"])
    )
    mark_done(out, fp)
    return out, planes


def _probe_buckets(sig: int, n_planes: int, radius: int) -> list[int]:
    """Multiprobe: every bucket within Hamming distance ``radius``."""
    if not 0 <= radius <= 2:
        raise ValueError(f"multiprobe radius must be 0-2, got {radius}")
    out = [sig]
    if radius >= 1:
        for i in range(n_planes):
            out.append(sig ^ (1 << i))
    if radius >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                out.append(sig ^ (1 << i) ^ (1 << j))
    return out


def lsh_topk(
    sf_dir: str, k: int = 10, n_queries: int = 5,
    n_tables: int = LSH_TABLES, n_planes: int = LSH_PLANES,
    radius: int = LSH_RADIUS,
) -> pd.DataFrame:
    """LSH approximate top-k: per table, probe the query's bucket plus all
    buckets within ``radius`` sign flips; score ONLY the probed partitions
    (path-pruned reads, like ivf_topk); union candidates across tables and
    reduce per query. Same output schema as brute_force_topk; at the
    registered width the sf-scale result is empirically exact (recall vs
    brute force is test-covered at narrower widths)."""
    import glob as _glob

    import pyarrow.parquet as _pq
    import ray

    index_dir, planes = build_lsh_index(sf_dir, n_tables, n_planes)
    qids, qm = _query_matrix(sf_dir, n_queries)
    qsigs = _signatures(qm, planes)  # (Q, tables)

    # (table, bucket) → query indices probing it; each probed partition is
    # read ONCE and scored against exactly the queries that probe it
    by_part: dict[tuple[int, int], set[int]] = {}
    for qi in range(len(qids)):
        for ti in range(n_tables):
            for b in _probe_buckets(int(qsigs[qi, ti]), n_planes, radius):
                by_part.setdefault((ti, b), set()).add(qi)
    qref = ray.put((qids, qm))

    @ray.remote(num_cpus=1)
    def score_part(files: list[str], q_idx: list[int], qref):
        qids_all, qm_all = qref
        t = _pq.read_table(files, columns=["vec_id", "embedding"])
        ids = t.column("vec_id").to_numpy()
        mat = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
        sel = np.array(sorted(q_idx), dtype=np.int64)
        return _block_topk(qids_all[sel], qm_all[sel], ids, mat, k)

    refs = []
    for (ti, b), q_idx in sorted(by_part.items()):
        files = sorted(
            _glob.glob(os.path.join(index_dir, f"table={ti}", f"bucket={b}", "*.parquet"))
        )
        if files:
            refs.append(score_part.remote(files, sorted(q_idx), qref))
    frames = [f for f in ray.get(refs) if len(f)]
    if not frames:
        return pd.DataFrame(
            {"query_id": [], "neighbor_id": [], "rank": [], "cosine": []}
        ).astype({"query_id": "int64", "neighbor_id": "int64", "rank": "int64",
                  "cosine": "float64"})
    # a vector found in several tables yields duplicate candidate rows —
    # dedupe before the per-query reduce
    cand = (
        pd.concat(frames, ignore_index=True)
        .drop_duplicates(subset=["query_id", "neighbor_id"])
    )
    return _merge_topk(ray.data.from_pandas(cand), k)


# --------------------------------------------------------------------------
# k-NN label classification: predict each query vector's label by majority
# vote over its k nearest neighbors — the retrieval-based classifier a
# labeled embedding store supports for free. Scale shape: the neighbor
# search is the streamed-corpus brute pass above (per-block top-k, corpus
# never driver-resident); the vote then touches only q × k candidate rows,
# and the voters' labels are fetched with a point-filtered read of exactly
# those vec_ids (never a labels broadcast — labels are corpus-sized).
# Determinism: neighbor set inherits the brute tie-break (cos desc, vec_id
# asc); the vote breaks ties by (votes desc, label asc).

KNN_K = 5
KNN_QUERIES = 10


def knn_classify(sf_dir: str, k: int = KNN_K, n_queries: int = KNN_QUERIES) -> pd.DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    topk = brute_force_topk(sf_dir, k=k, n_queries=n_queries)

    wanted = sorted(set(topk["neighbor_id"]) | set(topk["query_id"]))
    labels = (
        read_parquet_clean(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "label"],
            filter=pc.is_in(
                pads.field("vec_id"), value_set=pa.array(wanted, pa.int64())
            ),
        )
        .to_pandas()
        .set_index("vec_id")["label"]
    )

    topk["label"] = topk["neighbor_id"].map(labels)
    votes = (
        topk.groupby(["query_id", "label"], as_index=False)
        .size()
        .rename(columns={"size": "votes"})
        .sort_values(["query_id", "votes", "label"], ascending=[True, False, True])
    )
    out = votes.groupby("query_id", sort=True).head(1).reset_index(drop=True)
    out["true_label"] = out["query_id"].map(labels).astype("int32")
    out["votes"] = out["votes"].astype("int64")
    return out.rename(columns={"label": "predicted_label"})[
        ["query_id", "predicted_label", "votes", "true_label"]
    ]


def knn_classify_sql(k: int = KNN_K, n_queries: int = KNN_QUERIES) -> str:
    return f"""
WITH topk AS ({brute_force_topk_sql(k=k, n_queries=n_queries)}),
v AS (
  SELECT t.query_id, e.label, COUNT(*)::BIGINT AS votes
  FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
  GROUP BY t.query_id, e.label
), r AS (
  SELECT query_id, label, votes,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, label) AS rk
  FROM v
)
SELECT r.query_id, r.label AS predicted_label, r.votes,
       q.label AS true_label
FROM r JOIN embeddings q ON q.vec_id = r.query_id
WHERE r.rk = 1
"""


KNN_CLASSIFY_SQL = knn_classify_sql()


# ------------------------------------------------------------- MMR rerank
# Maximal Marginal Relevance (Carbonell & Goldstein 1998): greedy diverse
# top-k — each step picks argmax λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s).
# Production shape at 100 TB: retrieval is the streamed/indexed ANN stage
# (corpus streams, query broadcast), and MMR reranks only the candidate
# SHORTLIST — so the quadratic diversity term is pool-bounded (pool² sims),
# never corpus-bounded. Stage 1 reuses the brute-force block machinery
# (swap in ivf/lsh for the sublinear path); stage 2 is a driver-side greedy
# over pool=50 rows.
#
# Determinism contract: every cosine is quantized to an INTEGER number of
# micro-units (×1e6) and λ is the exact rational L/10, so the step score
# is the integer L·rel_i − (10−L)·maxsim_i — no float rounding anywhere in
# the comparison, ties break on vec_id asc, and the greedy trajectory is
# bit-identical to the oracle (the same greedy UNROLLED into K chained
# CTEs over the same integer arithmetic). Quantizing the SCORE instead
# (the first cut of this op) is not enough: 0.7·rel − 0.3·maxsim of 6-dp
# inputs lands exactly on the half-grid for ~10% of pairs, where half-up
# (numpy idiom) and half-away (DuckDB ROUND) disagree.

MMR_LAMBDA = 0.7
MMR_POOL = 50
MMR_K = 10
MMR_QUERY_ID = 0


def _cos_int(x) -> "np.ndarray":
    """Cosine → integer micro-units. Half-up on the raw (unquantized)
    cosine — divergence vs SQL's half-away ROUND is measure-zero because
    raw cosines never land exactly on the 1e-6 grid."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)


def mmr_rerank(
    sf_dir: str,
    k: int = MMR_K,
    pool: int = MMR_POOL,
    lam: float = MMR_LAMBDA,
) -> pd.DataFrame:
    """(rank, vec_id, rel) of the k MMR-selected diverse neighbors of
    query vec_id 0 out of its top-``pool`` cosine candidates."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    qids, qm = _query_matrix(sf_dir, MMR_QUERY_ID + 1)
    qref = ray.put((qids, qm))

    def block(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy()
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        bq, bm = ray.get(qref)
        return _block_topk(bq, bm, ids, mat, pool)

    cand = (
        read_parquet_clean(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(block, batch_format="pandas", batch_size=1024)
        .to_pandas()  # pool × n_blocks rows — candidate-bounded
        .sort_values(["cosine", "neighbor_id"], ascending=[False, True])
        .head(pool)
    )
    ids = cand["neighbor_id"].to_numpy(np.int64)

    # point-read of the pool's embeddings (row-group pruned, pool-bounded)
    t = (
        pads.dataset(f"{sf_dir}/embeddings.parquet")
        .to_table(
            columns=["vec_id", "embedding"],
            filter=pc.is_in(pads.field("vec_id"), value_set=pa.array(ids)),
        )
        .to_pandas()
        .set_index("vec_id")
        .loc[ids]
    )
    M = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True), 1e-30, None)
    rel_i = _cos_int(Mn @ qm[0])  # qm rows are normalized
    sim_i = _cos_int(Mn @ Mn.T)
    l_num = round(lam * 10)
    assert abs(lam * 10 - l_num) < 1e-9, "lam must be an exact tenth"

    selected: list[int] = []
    out = {"rank": [], "vec_id": [], "rel": []}
    remaining = np.ones(len(ids), dtype=bool)
    # negation-safe mask sentinel (lexsort negates scores; -int64.min
    # overflows back to itself and would sort masked rows FIRST)
    masked_score = np.iinfo(np.int64).min // 4
    for step in range(1, min(k, len(ids)) + 1):
        if step == 1:
            score = 10 * rel_i
        else:
            maxsim = sim_i[:, selected].max(axis=1)
            score = l_num * rel_i - (10 - l_num) * maxsim
        score = np.where(remaining, score, masked_score)
        # argmax with vec_id-asc tie-break (ids not sorted: lexsort)
        order = np.lexsort((ids, -score))
        pick = order[0]
        selected.append(pick)
        remaining[pick] = False
        out["rank"].append(step)
        out["vec_id"].append(int(ids[pick]))
        out["rel"].append(float(rel_i[pick]) / 1e6)
    return pd.DataFrame(out).astype({"rank": "int64", "vec_id": "int64"})


def mmr_rerank_sql(
    k: int = MMR_K, pool: int = MMR_POOL, lam: float = MMR_LAMBDA
) -> str:
    l_num = round(lam * 10)
    assert abs(lam * 10 - l_num) < 1e-9, "lam must be an exact tenth"
    d_num = 10 - l_num
    head = f"""
WITH cand0 AS (
  SELECT e.vec_id, e.embedding,
         list_cosine_similarity(
           (SELECT embedding FROM embeddings WHERE vec_id = {MMR_QUERY_ID})::DOUBLE[],
           e.embedding::DOUBLE[]) AS cos_raw
  FROM embeddings e WHERE e.vec_id <> {MMR_QUERY_ID}
),
cand AS MATERIALIZED (
  SELECT vec_id, embedding, ROUND(cos_raw * 1000000)::BIGINT AS rel_i
  FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY cos_raw DESC, vec_id) AS rk
    FROM cand0
  ) WHERE rk <= {pool}
),
s1 AS MATERIALIZED (
  SELECT vec_id, embedding, rel_i FROM cand ORDER BY rel_i DESC, vec_id LIMIT 1
),
sel1 AS MATERIALIZED (SELECT vec_id, embedding FROM s1)"""
    parts = [head]
    for i in range(2, k + 1):
        parts.append(f""",
s{i} AS MATERIALIZED (
  SELECT c.vec_id, c.embedding, c.rel_i FROM cand c
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
  ORDER BY {l_num} * c.rel_i - {d_num} * (
            SELECT MAX(ROUND(list_cosine_similarity(
                     c.embedding::DOUBLE[], s.embedding::DOUBLE[]) * 1000000)::BIGINT)
            FROM sel{i - 1} s) DESC, c.vec_id
  LIMIT 1
),
sel{i} AS MATERIALIZED (SELECT vec_id, embedding FROM sel{i - 1}
           UNION ALL SELECT vec_id, embedding FROM s{i})""")
    union = "\nUNION ALL ".join(
        f"SELECT {i} AS rank, vec_id, rel_i / 1000000.0 AS rel FROM s{i}"
        for i in range(1, k + 1)
    )
    return "".join(parts) + f"\n{union}\nORDER BY rank"


MMR_RERANK_SQL = mmr_rerank_sql()


# --------------------------------------------------------------------------
RANGE_TAU = 0.30  # cosine threshold, applied to the 4-dp-rounded similarity
RANGE_NQ = 5


def range_search(sf_dir: str, tau: float = RANGE_TAU, n_queries: int = RANGE_NQ) -> pd.DataFrame:
    """Cosine RANGE search: every corpus vector within ``tau`` of each query
    (the radius-query twin of brute_force_topk — what dedup-by-threshold and
    retrieval-recall audits run). Same scale shape as the top-k op: queries
    broadcast once via ray.put, corpus streamed block-by-block, each block
    emitting only its in-radius rows — output is result-sized, never
    corpus-sized, and there is no merge stage at all (no per-query reduce:
    membership is a pure per-row predicate). Both sides threshold the
    ROUND(cos, 4) value so the float-summation-order difference between
    numpy and DuckDB cannot flip membership except at an exact 5e-5
    midpoint (the same accepted tolerance as the top-k family's output
    rounding)."""
    import ray

    qids, qm = _query_matrix(sf_dir, n_queries)
    qref = ray.put((qids, qm))

    def block(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy()
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30, None)
        bq, bm = ray.get(qref)
        sims = np.round(bm @ matn.T, 4)  # (Q, block)
        out = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi, qid in enumerate(bq):
            row = sims[qi]
            keep = (row >= tau) & (ids != qid)
            out["query_id"].extend([int(qid)] * int(keep.sum()))
            out["neighbor_id"].extend(ids[keep].tolist())
            out["cosine"].extend(row[keep].tolist())
        return pd.DataFrame(
            {
                "query_id": pd.Series(out["query_id"], dtype="int64"),
                "neighbor_id": pd.Series(out["neighbor_id"], dtype="int64"),
                "cosine": pd.Series(out["cosine"], dtype="float64"),
            }
        )

    return (
        read_parquet_clean(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(block, batch_format="pandas", batch_size=1024)
        .to_pandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )


def range_search_sql(tau: float = RANGE_TAU, n_queries: int = RANGE_NQ) -> str:
    return f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {n_queries}),
sims AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(
           q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 4) AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cosine
FROM sims WHERE cosine >= {tau}
ORDER BY query_id, neighbor_id
"""


RANGE_SEARCH_SQL = range_search_sql()


# --------------------------------------------------------------------------
# Scalar-quantized ANN (SQ8 / ADC) -------------------------------------------
# The compressed-domain scale path: encode every stored vector to one byte
# per dimension against a per-dimension [min, max] grid (4x smaller than
# float32, 8x smaller than float64 — at 100 TB the difference between an
# in-memory index and a disk-bound one), then search with ASYMMETRIC
# distance computation: the full-precision query scored against each code's
# reconstruction (bucket center), the standard SQ/PQ trade (Jegou et al.,
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011 — SQ is
# the one-subspace-per-dim corner of PQ).
#
# Scale shape: the grid is learned by a distributed pass whose per-batch
# combiner emits one (dim, min, max) row per dimension per block (constant
# size), merged by a |dims|-row groupby; encode+score is then a single
# map_batches with the 64x2-float grid broadcast in the closure. The corpus
# crosses no exchange; the only reduce is per-block top-k candidates.
#
# Determinism contract: the encode expression ((v-mn)/(mx-mn)*256, floored,
# clipped to [0,255]) and the reconstruction (mn + (code+0.5)*(mx-mn)/256)
# are written in the SAME operation order here and in the SQL oracle, so
# codes and centers are bit-identical IEEE doubles on both sides; ranking
# uses the 6-dp half-away-rounded cosine (the repo's bm25 convention) so
# summation-order ulp drift cannot reorder neighbors.

SQ_LEVELS = 256
SQ_K = 10
SQ_NQ = 5


def _sq_grid(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Distributed per-dimension min/max: per-batch combiner -> tiny groupby."""
    from ray.data.aggregate import Max, Min

    def mm(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "dim": np.arange(mat.shape[1], dtype=np.int64),
                "mn": mat.min(axis=0),
                "mx": mat.max(axis=0),
            }
        )

    g = (
        read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .map_batches(mm, batch_format="pandas")
        .groupby("dim")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()
        .sort_values("dim")
    )
    return g["mn"].to_numpy(np.float64), g["mx"].to_numpy(np.float64)


def sq_topk(sf_dir: str, k: int = SQ_K, n_queries: int = SQ_NQ) -> pd.DataFrame:
    """Top-k by cosine(query, SQ8 reconstruction), excluding self; rank by
    (cosine@6dp desc, neighbor_id asc); reported cosine at 4dp."""
    import ray

    from ..pipelines.analytics import r2

    mn, mx = _sq_grid(sf_dir)
    span = mx - mn
    # raw (un-normalized) queries: the oracle divides the raw dot product by
    # the norm product AFTER summation — mirror that operation order exactly
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    emb = (
        read_parquet_clean(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filter=pc.less(pads.field("vec_id"), n_queries),
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    qids = emb["vec_id"].to_numpy()
    qraw = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    qref = ray.put((qids, qraw))

    def block(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy()
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            code = np.clip(np.floor((mat - mn) / span * SQ_LEVELS), 0, SQ_LEVELS - 1)
        centers = np.where(span > 0, mn + (code + 0.5) * span / SQ_LEVELS, mn)
        bq, bm = ray.get(qref)
        qn = np.sqrt((bm * bm).sum(axis=1, keepdims=True))  # (Q, 1)
        cn = np.sqrt((centers * centers).sum(axis=1))  # (block,)
        sims = r2((bm @ centers.T) / (qn * cn[None, :]), 6)  # ranking precision
        out = {"query_id": [], "neighbor_id": [], "cosine": []}
        kk = min(k, sims.shape[1])
        for qi, qid in enumerate(bq):
            s = sims[qi].copy()
            s[ids == qid] = -np.inf
            order = np.lexsort((ids, -s))[:kk]
            out["query_id"].extend([int(qid)] * len(order))
            out["neighbor_id"].extend(ids[order].astype(np.int64))
            out["cosine"].extend(s[order])
        return pd.DataFrame(out)

    cand = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(block, batch_format="pandas", batch_size=1024)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = r2(g["cosine"], 4)
        return g[["query_id", "neighbor_id", "rank", "cosine"]]

    return (
        cand.groupby("query_id")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def sq_topk_sql(k: int = SQ_K, n_queries: int = SQ_NQ) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
g AS (SELECT d, MIN(v) AS mn, MAX(v) AS mx FROM e GROUP BY d),
c AS (
  SELECT e.vec_id, e.d,
         CASE WHEN g.mx > g.mn THEN
           g.mn + (LEAST({SQ_LEVELS - 1}, GREATEST(0,
             FLOOR((e.v - g.mn) / (g.mx - g.mn) * {SQ_LEVELS}))) + 0.5)
           * (g.mx - g.mn) / {SQ_LEVELS}
         ELSE g.mn END AS cv
  FROM e JOIN g USING (d)
),
q AS (SELECT vec_id, d, v FROM e WHERE vec_id < {n_queries}),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(SUM(q.v * c.cv)
               / (SQRT(SUM(q.v * q.v)) * SQRT(SUM(c.cv * c.cv))), 6) AS cs
  FROM q JOIN c ON c.d = q.d AND c.vec_id <> q.vec_id
  GROUP BY q.vec_id, c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cs,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cs DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank, ROUND(cs, 4) AS cosine
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


SQ_TOPK_SQL = sq_topk_sql()
