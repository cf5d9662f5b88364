"""Deduplication suite over the documents table: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Corpus-scale generalization of the engine's URL-seen exact dedup (D1-D3):
*exact* uses the same hash-partition + per-group-first shape; the near-dup
family follows the standard sketch pipeline (shingle → minhash → band →
bucket groupby → verified candidate pairs — the mergeable-sketch pattern of
the MinHash/LSH literature). Every stage is map_batches / groupby; candidate
verification is exact, so emitted pairs have **exact precision** and the
sketch only bounds recall.

Determinism: all hash seeds fixed; pair output is (a < b) ordered and
sorted. No wall-clock, no RNG state.
"""

from __future__ import annotations
from fundamental_ray.sources.parquet import read_parquet_clean
from fundamental_ray.state.diskcache import cache_valid, mark_done, source_fingerprint

import hashlib
import os
import re
import struct
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

WORD_RE = re.compile(r"\S+")


def _r6(x):
    """Half-away-from-zero rounding to 6 dp — matches DuckDB ROUND (the
    driver oracle); np.round is half-to-even."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6

N_PERM = 64
BANDS = 16  # 16 bands × 4 rows
ROWS_PER_BAND = N_PERM // BANDS
# Stop-band cap (the minhash sibling of text.py's CONTAIN_MAXDOCS stop-hash
# rule): an LSH bucket holding > CAP docs is a boilerplate/identical-text
# cluster whose within-band pair fan-out is O(n²) — a real corpus puts 10⁵+
# docs in one band and the group explodes. Capped bands emit NO candidate
# pairs; the cap is part of the op contract, mirrored in every mh_bands
# oracle (registry._mh_band_pairs_sql HAVING), and surfaced per band by
# lsh_band_audit — no silent truncation. Members of a capped band still
# pair through their OTHER 15 bands (near-dups agree on many bands), and
# the exact-dup population a giant band implies is dedup_exact's job.
# Env override: adversarial tests force it low.
LSH_BAND_CAP = int(os.environ.get("FR_LSH_BAND_CAP", "256"))
_MERSENNE = (1 << 61) - 1


def _read_docs(sf_dir: str) -> ray.data.Dataset:
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# ------------------------------------------------------------------ exact
def exact_dedup_ds(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup as a Dataset (text_hash, keep_doc_id, dup_count): the
    distributed aggregate stays in the object store so composites (e.g.
    pipelines/clean.py) can hash-partition-JOIN against it instead of
    collecting a driver-side keep map."""
    from ray.data.aggregate import Count, Min

    def key(df: pd.DataFrame) -> pa.Table:
        # Arrow out: keeps the groupby shuffle's schemas metadata-free
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(dtype=np.int64)),
                "text_hash": pa.array(
                    [
                        hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in df["text"].fillna("")
                    ],
                    pa.string(),
                ),
            }
        )

    return (
        _read_docs(sf_dir)
        .map_batches(key, batch_format="pandas")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="dup_count"))
    )


def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: hash(text) partition → keep min doc_id per group.
    The reduction is a groupby.aggregate(Min, Count) — a vectorized,
    combiner-style shuffle; a map_groups here would build one pandas frame
    per distinct hash (billions of tiny groups at corpus scale)."""
    out = exact_dedup_ds(sf_dir).to_pandas()
    return out.astype({"keep_doc_id": "int64", "dup_count": "int64"})


EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_hash, MIN(doc_id)::BIGINT AS keep_doc_id,
       COUNT(*)::BIGINT AS dup_count
FROM documents GROUP BY 1
"""


# ------------------------------------------------------- shingles/minhash
def _shingles(text: str, k: int = 3) -> set[bytes]:
    toks = WORD_RE.findall(text.lower())
    if len(toks) < k:
        return {(" ".join(toks)).encode()} if toks else set()
    return {" ".join(toks[i : i + k]).encode() for i in range(len(toks) - k + 1)}


_PERM_A = np.array(
    [struct.unpack(">Q", hashlib.blake2b(f"a{i}".encode(), digest_size=8).digest())[0]
     % _MERSENNE or 1 for i in range(N_PERM)],
    dtype=np.uint64,
)
_PERM_B = np.array(
    [struct.unpack(">Q", hashlib.blake2b(f"b{i}".encode(), digest_size=8).digest())[0]
     % _MERSENNE for i in range(N_PERM)],
    dtype=np.uint64,
)


def minhash_signature(text: str) -> np.ndarray:
    sh = _shingles(text)
    if not sh:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = np.array([zlib.crc32(s) for s in sh], dtype=np.uint64)  # (S,)
    # (S, P) affine hash family; uint64 multiply wraps mod 2^64 (deterministic,
    # well-mixed), then reduced mod the Mersenne prime
    vals = (base[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) % _MERSENNE
    return vals.min(axis=0)


def jaccard(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def _shingle_blob(text: str) -> bytes:
    """Shingle set serialized as one sorted newline-joined binary blob —
    a flat binary column survives hash-join exchanges (nested list payloads
    don't), and set ops recover it with one split."""
    return b"\n".join(sorted(_shingles(text)))


def _blob_jaccard(blob_a: bytes, blob_b: bytes) -> float:
    sa = set(blob_a.split(b"\n")) if blob_a else set()
    sb = set(blob_b.split(b"\n")) if blob_b else set()
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


SHINGLE_INDEX_BUCKETS = 16
SHINGLE_INDEX_VERSION = "v1"


def _shingle_index(sf_dir: str, num_buckets: int = SHINGLE_INDEX_BUCKETS) -> str:
    """One-time doc_id-hash-partitioned shingle-blob index (the dedup
    sibling of crawl/fetchstore.build_fetch_index): documents →
    (bucket = doc_id % B, doc_id, blob) → one groupby exchange →
    per-bucket Parquet sorted by doc_id with small row groups, so later
    point-lookups prune row groups via min/max stats. Idempotent via
    _DONE; blobs cross exactly one exchange, once per corpus."""
    import hashlib as _hl

    import pyarrow.parquet as _pq

    slug = _hl.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out_dir = f"/tmp/fr_dedup_index/{slug}-b{num_buckets}"
    fp = f"{SHINGLE_INDEX_VERSION}:{num_buckets}:" + source_fingerprint(
        f"{sf_dir}/documents.parquet"
    )
    if cache_valid(out_dir, fp):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    def blob_bucket(df: pd.DataFrame) -> pa.Table:
        # Arrow out: pandas-born blocks would carry unhashable dict schema
        # metadata into the bucket shuffle (see sources/parquet.py)
        ids = df["doc_id"].astype("int64").to_numpy()
        return pa.table(
            {
                "bucket": pa.array((ids % num_buckets).astype("int32")),
                "doc_id": pa.array(ids),
                "sh": pa.array(
                    [_shingle_blob(t) for t in df["text"].fillna("")], pa.binary()
                ),
            }
        )

    def write_bucket(t: pa.Table) -> pa.Table:
        t = t.sort_by("doc_id")
        b = t.column("bucket")[0].as_py()
        d = os.path.join(out_dir, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "part-0.parquet")
        _pq.write_table(
            t.drop_columns(["bucket"]), path + ".tmp", row_group_size=1024
        )
        os.replace(path + ".tmp", path)
        return pa.table({"bucket": [b], "rows": [t.num_rows]})

    (
        _read_docs(sf_dir)
        .map_batches(blob_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .materialize()
    )
    mark_done(out_dir, fp)
    return out_dir


def _lookup_blobs(index_dir: str, ids: "np.ndarray", num_buckets: int) -> dict:
    """Batch point-read of shingle blobs by doc_id from the bucketed index:
    bucket path pruning + isin row-group pruning (sorted doc_id). Returns a
    BATCH-sized dict — never corpus-proportional."""
    import glob as _glob

    import pyarrow.dataset as pads

    from ..crawl.fetchstore import _open_dataset

    out: dict = {}
    ids = np.unique(ids)
    for b in np.unique(ids % num_buckets):
        paths = sorted(
            _glob.glob(os.path.join(index_dir, f"bucket={int(b)}", "*.parquet"))
        )
        if not paths:
            continue
        want = ids[ids % num_buckets == b]
        t = _open_dataset(paths).to_table(
            columns=["doc_id", "sh"],
            filter=pc.is_in(pads.field("doc_id"), value_set=pa.array(want)),
        )
        out.update(zip(t.column("doc_id").to_pylist(), t.column("sh").to_pylist()))
    return out


def _bands_batch(df: pd.DataFrame) -> pa.Table:
    """docs batch → exploded (band, band_hash, doc_id) rows. Arrow out (not
    pandas) so the blocks entering the LSH shuffles carry hashable
    metadata-free schemas — pandas-born blocks attach b'pandas' dict
    metadata and every reduce stage then logs "Failed to hash the schemas"
    and loses Ray's schema-dedup path."""
    rows = {"band": [], "band_hash": [], "doc_id": []}
    for doc_id, text in zip(df["doc_id"], df["text"].fillna("")):
        sig = minhash_signature(text)
        for b in range(BANDS):
            chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            rows["band"].append(b)
            rows["band_hash"].append(zlib.crc32(chunk.tobytes()))
            rows["doc_id"].append(doc_id)
    return pa.table(
        {
            "band": pa.array(rows["band"], pa.int64()),
            "band_hash": pa.array(rows["band_hash"], pa.int64()),
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
        }
    )


def lsh_band_audit(sf_dir: str, band_cap: int = LSH_BAND_CAP) -> pd.DataFrame:
    """Per-band LSH bucket audit: (band, n_buckets, max_members,
    n_overflow) — the published view of the stop-band cap, so capped
    buckets are a queryable fact rather than silent truncation (the same
    discipline as text.py's containment stop-hash rule).

    Scale shape: explode → ONE (band, band_hash) int-only exchange with
    Count → per-batch per-band partials → 16-row final aggregate. Bucket
    counts never materialize in one place."""
    from ray.data.aggregate import Count, Max, Sum

    docs = _read_docs(sf_dir)
    counts = (
        docs.map_batches(_bands_batch, batch_format="pandas")
        .groupby(["band", "band_hash"])
        .aggregate(Count(alias_name="n"))
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["over"] = (df["n"] > band_cap).astype("int64")
        g = (
            df.groupby("band")
            .agg(
                n_buckets=("n", "size"),
                max_members=("n", "max"),
                n_overflow=("over", "sum"),
            )
            .reset_index()
        )
        return g.astype(
            {"band": "int64", "n_buckets": "int64", "max_members": "int64",
             "n_overflow": "int64"}
        )

    out = (
        counts.map_batches(partial, batch_format="pandas")
        .groupby("band")
        .aggregate(
            Sum("n_buckets", alias_name="n_buckets"),
            Max("max_members", alias_name="max_members"),
            Sum("n_overflow", alias_name="n_overflow"),
        )
        .to_pandas()
        .astype(
            {"band": "int64", "n_buckets": "int64", "max_members": "int64",
             "n_overflow": "int64"}
        )
        .sort_values("band")
        .reset_index(drop=True)
    )
    return out


# (abspath, fingerprint, threshold, buckets, cap) -> verified pair frame.
# Three registered consumers (dedup_minhash_lsh, duplicate_clusters inside
# pipeline_clean_corpus, dedup_method_report) otherwise re-run the full
# banding + disk-join verify each (~2.4 s warm at sf0.1); the pair set is
# candidate-bounded, so holding it is the broadcast-small-side trade.
_LSH_PAIR_MEMO: dict = {}


def minhash_lsh_pairs(
    sf_dir: str, threshold: float = 0.6,
    num_buckets: int = SHINGLE_INDEX_BUCKETS,
    band_cap: int = LSH_BAND_CAP,
) -> pd.DataFrame:
    """MinHash+LSH near-dup pairs: signature per doc → explode to
    (band, band_hash, doc_id) → groupby band bucket → candidate pairs →
    exact-Jaccard verification (precision 1.0 by construction).
    Fingerprint-memoized per (corpus, params) — see _LSH_PAIR_MEMO.

    Verification is a doc_id hash-partitioned DISK JOIN, end to end off
    the driver: candidate pairs (deduped by a combiner-style groupby over
    (a, b) — int pairs only, the cheapest possible exchange) stream
    through map_batches tasks that point-read their members' shingle
    blobs from the bucketed shingle index (built once per corpus; the
    same bucket-pruned, row-group-pruned lookup the crawl fetch index
    uses for pages). No corpus-proportional structure — candidate list,
    shingle dict or otherwise — exists on the driver or in any single
    task; per-task state is batch-sized."""
    from ray.data.aggregate import Count

    memo_key = (
        os.path.abspath(sf_dir),
        source_fingerprint(f"{sf_dir}/documents.parquet"),
        threshold, num_buckets, band_cap,
    )
    if memo_key in _LSH_PAIR_MEMO:
        return _LSH_PAIR_MEMO[memo_key]

    index_dir = _shingle_index(sf_dir, num_buckets)
    docs = _read_docs(sf_dir)

    bands = _bands_batch

    def pairs(g: pd.DataFrame) -> pa.Table:
        ids = sorted(g["doc_id"].tolist())
        out = {"a": [], "b": []}
        if len(ids) <= band_cap:  # stop-band: giant buckets excluded
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out["a"].append(ids[i])
                    out["b"].append(ids[j])
        return pa.table(
            {"a": pa.array(out["a"], pa.int64()), "b": pa.array(out["b"], pa.int64())}
        )

    # candidate (a, b) pairs, deduped across bands by a combiner groupby —
    # the same pair surfacing from multiple bands collapses in the shuffle
    cand = (
        docs.map_batches(bands, batch_format="pandas")
        .groupby(["band", "band_hash"])
        .map_groups(pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="n_bands"))
        # n_bands is dropped inside verify (not via .drop_columns, an
        # Arrow-format op that would re-convert the aggregate's pandas
        # blocks and re-attach the unhashable schema metadata)
    )

    # pandas IN (Ray 2.49's multi-key aggregate can emit pandas blocks;
    # converting those to Arrow batches re-attaches unhashable b'pandas'
    # schema metadata and the batch-assembly unify logs hash warnings),
    # Arrow OUT (clean schema for the final collect)
    def verify(df: pd.DataFrame) -> pa.Table:
        a = df["a"].to_numpy(dtype=np.int64, copy=False)
        b = df["b"].to_numpy(dtype=np.int64, copy=False)
        blobs = _lookup_blobs(index_dir, np.concatenate([a, b]), num_buckets)
        sims = _r6([_blob_jaccard(blobs[x], blobs[y]) for x, y in zip(a, b)])
        out = pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "jaccard": pa.array(np.asarray(sims, dtype=np.float64)),
            }
        )
        return out.filter(pc.greater_equal(out.column("jaccard"), threshold))

    res = cand.map_batches(
        verify, batch_format="pandas", batch_size=8192
    ).to_pandas()
    if len(res) == 0:
        out = pd.DataFrame({"a": [], "b": [], "jaccard": []}).astype(
            {"a": "int64", "b": "int64", "jaccard": "float64"}
        )
    else:
        out = (
            res.astype({"a": "int64", "b": "int64"})
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
    _LSH_PAIR_MEMO[memo_key] = out
    return out


def _block_refs_of(ds: ray.data.Dataset) -> list:
    """Materialize a Dataset into the OBJECT STORE and return its Arrow
    block refs — the fan-out handle for block-pair (O(B²) task) algorithms.
    Blocks live in plasma (spillable), never on the driver."""
    mat = ds.materialize()
    return [r for bundle in mat.iter_internal_ref_bundles() for r in bundle.block_refs]



def _as_arrow(block) -> pa.Table:
    """Blocks materialized from pandas-format stages arrive as DataFrames;
    normalize to Arrow for the pair tasks."""
    return block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)

def ngram_jaccard_pairs(
    sf_dir: str, threshold: float = 0.6, n_blocks: int = 16
) -> pd.DataFrame:
    """Exact n-gram Jaccard over ALL pairs — the brute-force recall oracle
    for the sketch paths. O(n²) work is inherent to the exact oracle; the
    dataflow distributes it as a block-pair fan-out: the (doc_id,
    shingle-blob) table is materialized into the object store, and one task
    per unordered block pair (i ≤ j) pulls its two zero-copy plasma blocks
    and emits that pair-block's qualifying rows. The corpus never touches
    the driver; only the above-threshold result does. Production dedup at
    corpus scale is the sketch family (minhash/simhash) — this is their
    recall yardstick."""
    import ray

    def blob(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "sh": [_shingle_blob(t) for t in df["text"].fillna("")],
            }
        )

    sh_ds = (
        _read_docs(sf_dir)
        .map_batches(blob, batch_format="pandas")
        .repartition(n_blocks)
    )
    refs = _block_refs_of(sh_ds)

    @ray.remote(num_cpus=1)
    def pair_block(x, y, same: bool) -> pd.DataFrame:
        x = _as_arrow(x)
        ids_x = x.column("doc_id").to_pylist()
        sh_x = [set(v.split(b"\n")) if v else set() for v in x.column("sh").to_pylist()]
        if same:
            ids_y, sh_y = ids_x, sh_x
        else:
            y = _as_arrow(y)
            ids_y = y.column("doc_id").to_pylist()
            sh_y = [set(v.split(b"\n")) if v else set() for v in y.column("sh").to_pylist()]
        out = {"a": [], "b": [], "jaccard": []}
        for i, (di, si) in enumerate(zip(ids_x, sh_x)):
            start = i + 1 if same else 0
            for dj, sj in zip(ids_y[start:], sh_y[start:]):
                if di == dj:
                    continue
                if not si and not sj:
                    sim = 1.0
                else:
                    inter = len(si & sj)
                    sim = inter / (len(si) + len(sj) - inter)
                sim = float(_r6(sim))
                if sim >= threshold:
                    out["a"].append(min(di, dj))
                    out["b"].append(max(di, dj))
                    out["jaccard"].append(sim)
        return pd.DataFrame(out)

    futs = [
        pair_block.remote(refs[i], refs[j], i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    frames = [f for f in ray.get(futs) if len(f)]
    if not frames:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []}).astype(
            {"a": "int64", "b": "int64", "jaccard": "float64"}
        )
    return (
        pd.concat(frames, ignore_index=True)
        .astype({"a": "int64", "b": "int64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------- simhash
SIMHASH_BITS = 63  # fits in int64 → survives Arrow/pandas round-trips intact


def simhash64(text: str) -> int:
    toks = WORD_RE.findall(text.lower())
    if not toks:
        return 0
    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
    v = np.zeros(SIMHASH_BITS, dtype=np.int64)
    for t in toks:
        h = np.uint64(
            struct.unpack(">Q", hashlib.blake2b(t.encode(), digest_size=8).digest())[0]
        )
        bits = (h >> shifts) & np.uint64(1)
        v += np.where(bits.astype(bool), 1, -1)
    return int(((v > 0).astype(np.uint64) << shifts).sum())


SIMHASH_BANDS = 7  # 7 × 9-bit bands over the 63-bit signature
_SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 9


def simhash_pairs(sf_dir: str, max_hamming: int = 6) -> pd.DataFrame:
    """SimHash near-dup: 63-bit signature, 7×9-bit band blocking.
    Pigeonhole guarantees FULL recall for hamming ≤ 6 (7 bands, ≤6 flipped
    bits → at least one band untouched), so at the default threshold the
    output equals the brute-force hamming join exactly — that equivalence
    is the driver oracle. Verification is exact hamming (exact precision).

    Band rows are emitted inside the signature map_batches stage (one
    distributed explode), never by a driver-side loop over signatures."""

    def sig_bands(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        hs = np.fromiter(
            (simhash64(t) for t in df["text"].fillna("")), dtype=np.int64, count=n
        )
        band = np.tile(np.arange(SIMHASH_BANDS, dtype=np.int32), n)
        rep_h = np.repeat(hs, SIMHASH_BANDS)
        band_val = (rep_h >> (band * _SIMHASH_BAND_BITS)) & ((1 << _SIMHASH_BAND_BITS) - 1)
        return pd.DataFrame(
            {
                "band": band,
                "band_val": band_val.astype("int64"),
                "doc_id": np.repeat(df["doc_id"].to_numpy(), SIMHASH_BANDS),
                "simhash": rep_h,
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].tolist()
        hs = g["simhash"].tolist()
        out = {"a": [], "b": [], "hamming": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(hs[i] ^ hs[j]).count("1")
                if d <= max_hamming:
                    out["a"].append(ids[i])
                    out["b"].append(ids[j])
                    out["hamming"].append(d)
        return pd.DataFrame(out)

    cand = (
        _read_docs(sf_dir)
        .map_batches(sig_bands, batch_format="pandas")
        .groupby(["band", "band_val"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(cand) == 0:
        return pd.DataFrame({"a": [], "b": [], "hamming": []}).astype(
            {"a": "int64", "b": "int64", "hamming": "int64"}
        )
    return (
        cand.drop_duplicates(subset=["a", "b"])
        .astype({"a": "int64", "b": "int64", "hamming": "int64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


# ------------------------------------------------------------- embeddings
def embedding_neardup_pairs(
    sf_dir: str, threshold: float = 0.92, n_blocks: int = 8
) -> pd.DataFrame:
    """Embedding-cosine near-dup, exact, fully off the driver: the
    row-normalized embedding table is materialized into the object store
    and one task per unordered block pair computes its block×block matmul
    against two zero-copy plasma blocks (same fan-out shape as
    ngram_jaccard_pairs). The full matrix is never assembled anywhere —
    not on the driver, not in any single task. The sublinear scale path is
    ``embedding_neardup_ivf`` (bucket-partitioned, probe-pruned)."""
    import ray

    def norm_rows(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        m = m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-30, None)
        return pd.DataFrame(
            {"vec_id": df["vec_id"].astype("int64"), "embedding": list(m)}
        )

    ds = (
        read_parquet_clean(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(norm_rows, batch_format="pandas")
        .repartition(n_blocks)
    )
    refs = _block_refs_of(ds)

    @ray.remote(num_cpus=1)
    def pair_block(x, y, same: bool) -> pd.DataFrame:
        x = _as_arrow(x)
        ids_x = np.asarray(x.column("vec_id").to_numpy(zero_copy_only=False))
        m_x = np.stack(x.column("embedding").to_pandas().to_numpy())
        if same:
            ids_y, m_y = ids_x, m_x
        else:
            y = _as_arrow(y)
            ids_y = np.asarray(y.column("vec_id").to_numpy(zero_copy_only=False))
            m_y = np.stack(y.column("embedding").to_pandas().to_numpy())
        sims = m_x @ m_y.T
        ii, jj = np.nonzero(sims >= threshold)
        out = {"a": [], "b": [], "cosine": []}
        for i, j in zip(ii, jj):
            a, c = int(ids_x[i]), int(ids_y[j])
            if a == c or (same and a > c):
                continue  # same-block: upper triangle only
            out["a"].append(min(a, c))
            out["b"].append(max(a, c))
            out["cosine"].append(round(float(sims[i, j]), 4))
        return pd.DataFrame(out)

    futs = [
        pair_block.remote(refs[i], refs[j], i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    frames = [f for f in ray.get(futs) if len(f)]
    if not frames:
        return pd.DataFrame({"a": [], "b": [], "cosine": []}).astype(
            {"a": "int64", "b": "int64", "cosine": "float64"}
        )
    return (
        pd.concat(frames, ignore_index=True)
        .astype({"a": "int64", "b": "int64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def embedding_neardup_ivf(
    sf_dir: str, threshold: float = 0.92, n_centroids: int = 16, n_probe: int = 4
) -> pd.DataFrame:
    """Scale path for embedding near-dup: instead of broadcasting the full
    matrix, reuse the bucket-partitioned IVF index (ops/ann.build_ivf_index)
    — each vector's candidates come from its own bucket plus its
    ``n_probe`` nearest centroid buckets, read back bucket-by-bucket.
    Exactness becomes recall-bounded (measured vs the brute pairs in
    tests); precision stays exact because every candidate pair is verified
    with the true cosine."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq
    import ray

    from .ann import build_ivf_index

    index_dir, cents = build_ivf_index(sf_dir, n_centroids)

    def load_bucket(b: int):
        files = sorted(_glob.glob(_os.path.join(index_dir, f"bucket={b}", "*.parquet")))
        if not files:
            return None
        t = _pq.read_table(files, columns=["vec_id", "embedding"])
        ids = t.column("vec_id").to_numpy()
        m = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
        m = m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-30, None)
        return ids, m

    # bucket neighbor lists from centroid geometry (tiny, driver-side)
    probes = np.argsort(-(cents @ cents.T), axis=1)[:, :n_probe]

    @ray.remote(num_cpus=1)
    def pairs_for_bucket(b: int, probe_list: list[int]):
        base = load_bucket(b)
        if base is None:
            return None
        ids_a, m_a = base
        out = {"a": [], "b": [], "cosine": []}
        for pb in probe_list:
            other = base if pb == b else load_bucket(int(pb))
            if other is None:
                continue
            ids_b, m_b = other
            sims = m_a @ m_b.T
            ii, jj = np.nonzero(sims >= threshold)
            for i, j in zip(ii, jj):
                a, c = int(ids_a[i]), int(ids_b[j])
                if a == c:
                    continue
                # emit the normalized pair unconditionally: probe lists are
                # asymmetric (b in a's probes ⇏ a in b's), so dropping
                # a > c pairs would lose found matches; the downstream
                # drop_duplicates absorbs symmetric-probe double counting
                out["a"].append(min(a, c))
                out["b"].append(max(a, c))
                out["cosine"].append(round(float(sims[i, j]), 4))
        return pd.DataFrame(out)

    refs = [
        pairs_for_bucket.remote(b, [int(x) for x in probes[b]])
        for b in range(n_centroids)
    ]
    frames = [f for f in ray.get(refs) if f is not None and len(f)]
    if not frames:
        return pd.DataFrame({"a": [], "b": [], "cosine": []}).astype(
            {"a": "int64", "b": "int64", "cosine": "float64"}
        )
    return (
        pd.concat(frames, ignore_index=True)
        .drop_duplicates(["a", "b"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def embedding_neardup_sql(threshold: float = 0.92) -> str:
    return f"""
SELECT a.vec_id AS a, b.vec_id AS b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {threshold}
"""

# ------------------------------------------- duplicate clusters (conn. comp.)
# Connected components over the near-dup pair list — the step that turns
# pairwise dedup output into per-document cluster assignments (keep the
# canonical min-id doc per cluster, drop the rest). Algorithm: alternating
# large-star / small-star rounds (Kiveris, Lattanzi, Mirrokni, Rastogi,
# Vassilvitskii — "Connected Components in MapReduce and Beyond", SoCC'14):
# every round is a per-node groupby, expressed here as the repo's standard
# bucketized vectorized fold (hash-bucket the grouping node, one numpy
# sort + segment-reduce per bucket) — no joins, no driver-side graph, and
# per-round state is edge-sized and spills with the object store.
CC_BUCKETS = 64


def _cc_round(edges: ray.data.Dataset, large: bool, num_buckets: int) -> ray.data.Dataset:
    """One star round. Edge invariant in AND out: rows (u, v) with u > v.

    large  — group the *symmetrized* incidence list by node g and point
             every neighbor bigger than g at m = min(N(g) ∪ {g}).
    small  — group (u, v) rows by the larger endpoint g = u and point
             every smaller neighbor AND g itself at m = min(N(g) ∪ {g}).

    Both emit strictly (bigger, smaller) rows, so the invariant holds and
    self-loops never appear. Duplicate edges collapse inside the bucket
    that owns g — no extra global dedup shuffle per round.
    """

    def shape(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        if large:
            g = np.concatenate([u, v])
            o = np.concatenate([v, u])
        else:
            g, o = u, v
        return pa.table(
            {"g": g, "o": o, "bucket": (g % np.int64(num_buckets)).astype(np.int64)}
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        pairs = np.stack(
            [df["g"].to_numpy(np.int64), df["o"].to_numpy(np.int64)], axis=1
        )
        pairs = np.unique(pairs, axis=0)  # sorts by (g, o) and dedupes
        g, o = pairs[:, 0], pairs[:, 1]
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        counts = np.diff(np.r_[starts, len(g)])
        heads = g[starts]
        m_seg = np.minimum(np.minimum.reduceat(o, starts), heads)
        m = np.repeat(m_seg, counts)
        if large:
            mask = o > g
            out_u, out_v = o[mask], m[mask]
        else:
            mask = o != m
            out_u = np.concatenate([o[mask], heads])
            out_v = np.concatenate([m[mask], m_seg])
            keep = out_u != out_v  # g == m ⇒ the (g, m) row is a self-loop
            out_u, out_v = out_u[keep], out_v[keep]
        return pd.DataFrame({"u": out_u.astype(np.int64), "v": out_v.astype(np.int64)})

    return (
        edges.map_batches(shape, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )


def _cc_checksum(edges: ray.data.Dataset) -> tuple[int, int]:
    """(row count, order/partition-invariant wrapping checksum) — the
    fixed-point test without collecting edges anywhere."""

    def part(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            chk = (u * np.uint64(6364136223846793005)
                   + v * np.uint64(1442695040888963407)).sum()
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "chk": pa.array([int(chk)], pa.uint64())})

    agg = edges.map_batches(part, batch_format="pyarrow").to_pandas()
    return int(agg["n"].sum()), int(np.uint64(agg["chk"].to_numpy(np.uint64).sum()))


def connected_components(
    edges: ray.data.Dataset, num_buckets: int = CC_BUCKETS, max_rounds: int = 64
) -> ray.data.Dataset:
    """Cluster assignment (doc_id → cluster_id = component min) from an
    undirected edge Dataset with columns (u, v), u != v. Alternates
    large-star / small-star until the edge set reaches its fixed point
    (O(log² n) rounds proven; ~4 observed on near-dup graphs, whose
    components are small and dense). Returns a Dataset of
    (doc_id, cluster_id) — corpus-sized, never collected here.

    Each round re-materializes the EDGE set (so the checksum fixed-point
    test reads a settled snapshot) — cost per round is bounded by the
    near-dup pair count, not the corpus: edges ≪ docs for any realistic
    dup rate, and blocks spill to plasma/disk, never to the driver."""

    def canon(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": np.maximum(u, v), "v": np.minimum(u, v)})

    cur = edges.map_batches(canon, batch_format="pyarrow").materialize()
    n, chk = _cc_checksum(cur)
    for _ in range(max_rounds):
        cur = _cc_round(_cc_round(cur, True, num_buckets), False, num_buckets).materialize()
        n2, chk2 = _cc_checksum(cur)
        if (n2, chk2) == (n, chk):
            break
        n, chk = n2, chk2
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")

    # At the fixed point the edges form stars centered at each component's
    # minimum: one (node, center) row per non-root node. Labels = those
    # rows plus (center, center) roots, folded by min for robustness.
    from ray.data.aggregate import Min

    def labels(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": np.concatenate([u, v]), "cluster_id": np.concatenate([v, v])}
        )

    return (
        cur.map_batches(labels, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Min("cluster_id", alias_name="cluster_id"))
    )


def duplicate_clusters_ds(
    sf_dir: str, threshold: float = 0.5
) -> ray.data.Dataset | None:
    """Cluster assignment as a Dataset (doc_id, cluster_id) — stays in the
    object store for hash-partitioned joins (pipelines/clean.py). Returns
    None when no near-dup pair exists (no doc is clustered)."""
    pairs = minhash_lsh_pairs(sf_dir, threshold)
    if len(pairs) == 0:
        return None
    edges = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array(pairs["a"].to_numpy(dtype=np.int64)),
                "v": pa.array(pairs["b"].to_numpy(dtype=np.int64)),
            }
        )
    )
    return connected_components(edges)


def duplicate_clusters(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """Registered query: MinHash+LSH near-dup pairs → connected components
    → (doc_id, cluster_id), sorted. Only documents that appear in at least
    one verified pair are clustered (singletons are implicitly their own
    cluster and are not emitted)."""
    ds = duplicate_clusters_ds(sf_dir, threshold)
    if ds is None:
        return pd.DataFrame({"doc_id": [], "cluster_id": []}).astype("int64")
    out = ds.to_pandas()
    return (
        out.astype({"doc_id": "int64", "cluster_id": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# ------------------------------------------------- chunk-level keep-first
# C4-style span dedup (Raffel et al. 2020 drop repeated three-sentence
# spans; reference analogue: the URL-seen keep-first discipline of
# crawl/seen.py applied to text spans): every duplicated chunk keeps its
# globally-first occurrence (min (doc_id, chunk_idx)) and is removed
# everywhere else; documents are reassembled from their surviving chunks.
# The segmenter is deterministic fixed-width word windows (the synthetic
# corpus has no sentence boundaries), so the SQL oracle can re-derive the
# exact chunking.
#
# Scale shape (the whole point):
#   pass 1  docs -> (h=md5-60bit(chunk), packed=doc_id*MAX+ci) NARROW rows
#           -> ONE exchange bucketed by h%B -> per-bucket winner = min
#           packed per h -> emit only the LOSER positions (dup-bounded)
#   pass 1b loser positions -> one dup-bounded exchange by doc-bucket ->
#           per-bucket sorted Parquet drop index (the shingle-index idiom)
#   pass 2  docs re-chunk LOCALLY, range-pruned point-read of their doc
#           buckets' drop rows, boolean mask, reassemble.
# Corpus text crosses ZERO exchange; only 16-byte hash rows pay the
# all-to-all once, plus the duplicate-rate-bounded drop list.
#
# Ray dedups on an md5 digest, the oracle on the chunk string. Digest
# width is configurable: 60-bit prefix (one int64 hash column — the
# bench default, collision-free at every tested sf) or the full 128-bit
# digest as TWO int64 columns (the 100-TB setting: at 10^12 chunks the
# 60-bit birthday bound is ~orders-of-1 collisions, 128-bit is ~1e-14).
# Set FR_CHUNK_HASH_BITS=128 (or pass hash_bits=128) for the wide path;
# both widths are oracle-green (test_ops chunk-dedup width tests).

CHUNK_DEDUP_W = 6  # words per chunk
CHUNK_DEDUP_MAX = 4096  # packed = doc_id * MAX + chunk_idx
CHUNK_DEDUP_HBUCKETS = 64
CHUNK_DEDUP_DBUCKETS = 64
CHUNK_DEDUP_VERSION = "1"
CHUNK_DEDUP_HASH_BITS = int(os.environ.get("FR_CHUNK_HASH_BITS", "60"))


def _chunk_rows(text: str) -> list[str]:
    w = text.split(" ")
    return [
        " ".join(w[i : i + CHUNK_DEDUP_W]) for i in range(0, len(w), CHUNK_DEDUP_W)
    ]


def _chunk_h60(chunk: str) -> int:
    return int(hashlib.md5(chunk.encode("utf-8")).hexdigest()[:15], 16)


def _chunk_h128(chunk: str) -> tuple[int, int]:
    """Full md5 digest as a signed-int64 pair (hi, lo) — two flat Arrow
    columns survive the hash exchange; no large-int object boxing."""
    return struct.unpack(">qq", hashlib.md5(chunk.encode("utf-8")).digest())


def _chunk_drop_index(sf_dir: str, hash_bits: int | None = None) -> str:
    """Build (once per corpus) the doc-bucketed Parquet index of DROPPED
    chunk positions (packed = doc_id*MAX + ci of every non-first duplicate
    occurrence). Two Ray exchanges: hash rows by h-bucket, losers by
    doc-bucket; idempotent via _DONE. ``hash_bits`` ∈ {60, 128} — the wide
    path ships (h_hi, h_lo) int64 pairs through the exchange instead of
    one 60-bit column (same row count, one extra 8-byte column)."""
    import hashlib as _hl

    import pyarrow.parquet as _pq

    hash_bits = CHUNK_DEDUP_HASH_BITS if hash_bits is None else hash_bits
    if hash_bits not in (60, 128):
        raise ValueError(f"hash_bits must be 60 or 128, got {hash_bits}")
    slug = _hl.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out_dir = f"/tmp/fr_chunkdedup/{slug}-w{CHUNK_DEDUP_W}-h{hash_bits}"
    fp = (
        f"{CHUNK_DEDUP_VERSION}:{CHUNK_DEDUP_W}:{hash_bits}:"
        + source_fingerprint(f"{sf_dir}/documents.parquet")
    )
    if cache_valid(out_dir, fp):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    wide = hash_bits == 128
    hkeys = ["h_hi", "h_lo"] if wide else ["h"]

    def hash_rows(df: pd.DataFrame) -> pd.DataFrame:
        hs, packed = [], []
        for d, t in zip(df["doc_id"].astype("int64"), df["text"].fillna("")):
            chunks = _chunk_rows(t)
            # fail fast: ci >= MAX would alias into doc d+1's packed range
            # (a real exception, not assert: -O must not strip this guard)
            if len(chunks) > CHUNK_DEDUP_MAX:
                raise ValueError(
                    f"doc {d}: {len(chunks)} chunks exceeds CHUNK_DEDUP_MAX — "
                    "raise the packing width"
                )
            for ci, ch in enumerate(chunks):
                hs.append(_chunk_h128(ch) if wide else _chunk_h60(ch))
                packed.append(int(d) * CHUNK_DEDUP_MAX + ci)
        out = {}
        if wide:
            hi = np.fromiter((h[0] for h in hs), dtype=np.int64, count=len(hs))
            lo = np.fromiter((h[1] for h in hs), dtype=np.int64, count=len(hs))
            out["hb"] = (lo.view(np.uint64) % CHUNK_DEDUP_HBUCKETS).astype("int32")
            out["h_hi"] = hi
            out["h_lo"] = lo
        else:
            h = np.asarray(hs, dtype=np.int64)
            out["hb"] = (h % CHUNK_DEDUP_HBUCKETS).astype("int32")
            out["h"] = h
        out["packed"] = np.asarray(packed, dtype=np.int64)
        return pd.DataFrame(out)

    def losers(g: pd.DataFrame) -> pd.DataFrame:
        win = g.groupby(hkeys)["packed"].transform("min")
        drop = g.loc[g["packed"] != win, "packed"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "dbucket": ((drop // CHUNK_DEDUP_MAX) % CHUNK_DEDUP_DBUCKETS).astype(
                    "int32"
                ),
                "packed": drop,
            }
        )

    def write_drops(t: pa.Table) -> pa.Table:
        t = t.sort_by("packed")
        b = t.column("dbucket")[0].as_py()
        d = os.path.join(out_dir, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "part-0.parquet")
        _pq.write_table(t.drop_columns(["dbucket"]), path + ".tmp", row_group_size=2048)
        os.replace(path + ".tmp", path)
        return pa.table({"dbucket": [b], "rows": [t.num_rows]})

    (
        _read_docs(sf_dir)
        .map_batches(hash_rows, batch_format="pandas")
        .groupby("hb")
        .map_groups(losers, batch_format="pandas")
        .groupby("dbucket")
        .map_groups(write_drops, batch_format="pyarrow")
        .materialize()
    )
    mark_done(out_dir, fp)
    return out_dir


def _dropped_in_range(index_dir: str, dbuckets: "np.ndarray", lo: int, hi: int):
    """Range-pruned read of dropped packed positions for the given doc
    buckets — batch-proportional, never corpus-proportional."""
    import glob as _glob

    import pyarrow.dataset as pads

    from ..crawl.fetchstore import _open_dataset

    parts = []
    for b in np.unique(dbuckets):
        paths = sorted(
            _glob.glob(os.path.join(index_dir, f"bucket={int(b)}", "*.parquet"))
        )
        if not paths:
            continue
        t = _open_dataset(paths).to_table(
            columns=["packed"],
            filter=(pads.field("packed") >= lo) & (pads.field("packed") <= hi),
        )
        parts.append(t.column("packed").to_numpy(zero_copy_only=False))
    return np.concatenate(parts) if parts else np.array([], dtype=np.int64)


def chunk_dedup(sf_dir: str, hash_bits: int | None = None) -> pd.DataFrame:
    """Registered query: (doc_id, text_dedup, n_kept) after global
    keep-first chunk dedup; docs whose every chunk was dropped are omitted
    (8 of 500 at sf0.01 — short docs whose chunks all occurred earlier).
    ``hash_bits=128`` selects the full-digest drop index (100-TB setting);
    both widths produce identical output absent 60-bit collisions."""
    index_dir = _chunk_drop_index(sf_dir, hash_bits)

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64").to_numpy()
        texts = df["text"].fillna("").tolist()
        chunked = [_chunk_rows(t) for t in texts]
        if len(ids):
            dropped = _dropped_in_range(
                index_dir,
                ids % CHUNK_DEDUP_DBUCKETS,
                int(ids.min()) * CHUNK_DEDUP_MAX,
                (int(ids.max()) + 1) * CHUNK_DEDUP_MAX - 1,
            )
        else:
            dropped = np.array([], dtype=np.int64)
        drop_set = set(dropped.tolist())
        out = {"doc_id": [], "text_dedup": [], "n_kept": []}
        for d, chunks in zip(ids, chunked):
            base = int(d) * CHUNK_DEDUP_MAX
            kept = [c for ci, c in enumerate(chunks) if base + ci not in drop_set]
            if kept:
                out["doc_id"].append(int(d))
                out["text_dedup"].append(" ".join(kept))
                out["n_kept"].append(len(kept))
        return pd.DataFrame(out).astype(
            {"doc_id": "int64", "n_kept": "int64"}
        )

    return (
        _read_docs(sf_dir)
        .map_batches(reassemble, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


CHUNK_DEDUP_SQL = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         unnest(range(len(string_split(text, ' ')))) AS wi
  FROM documents
),
ch AS (
  SELECT doc_id, wi // {CHUNK_DEDUP_W} AS ci,
         string_agg(word, ' ' ORDER BY wi) AS chunk
  FROM w GROUP BY doc_id, wi // {CHUNK_DEDUP_W}
),
own AS (
  SELECT chunk, MIN(doc_id * {CHUNK_DEDUP_MAX} + ci) AS keep
  FROM ch GROUP BY chunk
),
kept AS (
  SELECT c.doc_id, c.ci, c.chunk
  FROM ch c JOIN own o ON c.chunk = o.chunk
  WHERE c.doc_id * {CHUNK_DEDUP_MAX} + c.ci = o.keep
)
SELECT doc_id, string_agg(chunk, ' ' ORDER BY ci) AS text_dedup,
       COUNT(*)::BIGINT AS n_kept
FROM kept GROUP BY doc_id
"""


# ------------------------------------------------------ incremental dedup
# Delta-vs-corpus exact dedup — the 100-TB operating mode: a crawl never
# re-dedups the whole corpus when a new shard lands; it joins the DELTA
# against a persistent bucket-partitioned fingerprint index of the BASE
# corpus and only delta-sized data moves. Base = documents with
# doc_id % 5 != 0, delta = doc_id % 5 == 0 (deterministic split standing
# in for "yesterday's corpus" + "today's shard").
#
# Scale shape: the base index is built ONCE (md5(text) → min doc_id,
# hash-bucket-partitioned parquet, content-fingerprinted cache like the
# shingle/chunk indexes above); classification hash-buckets the delta the
# SAME way and each bucket fold point-reads only ITS index partition —
# per-task state is one bucket of the index, never the corpus; the only
# exchange is the delta's own bucket groupby. Within-delta duplicates
# resolve inside the fold (all rows of a hash land in one bucket).
#
# Reference analogy: store upserts dedup new scrapes against the existing
# store by URL (store/merge.py, database.go's INSERT OR REPLACE); this is
# the same contract content-addressed and delta-scaled.

INCR_BUCKETS = 64
_INCR_INDEX_VERSION = "v1"


def build_base_hash_index(sf_dir: str, num_buckets: int = INCR_BUCKETS) -> str:
    """Bucket-partitioned (text_hash, keep_doc_id) parquet index of the
    BASE split; idempotent per (corpus fingerprint, params)."""
    import os

    from ray.data.aggregate import Min

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/fr_incr_index/{tag}-b{num_buckets}-{_INCR_INDEX_VERSION}"
    fp = f"{_INCR_INDEX_VERSION}:{num_buckets}:" + source_fingerprint(
        f"{sf_dir}/documents.parquet"
    )
    if cache_valid(out, fp):
        return out
    os.makedirs(out, exist_ok=True)

    def key(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] % 5 != 0]
        h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"].fillna("")]
        b = np.array([int(x[:8], 16) for x in h], dtype=np.int64) & (num_buckets - 1)
        return pd.DataFrame(
            {"bucket": b, "text_hash": h, "doc_id": df["doc_id"].to_numpy()}
        )

    (
        _read_docs(sf_dir)
        .map_batches(key, batch_format="pandas")
        .groupby(["bucket", "text_hash"])
        .aggregate(Min("doc_id", alias_name="keep_doc_id"))
        .write_parquet(out, partition_cols=["bucket"])
    )
    mark_done(out, fp)
    return out


def incremental_dedup(sf_dir: str) -> pd.DataFrame:
    """Classify every DELTA doc against the base index:
    (doc_id, text_hash, status ∈ {dup_of_base, dup_in_delta, new},
    keep_doc_id). keep_doc_id = base min for dup_of_base, else the delta
    group's min (== own id for 'new' first occurrences)."""
    import glob

    import pyarrow.parquet as pq

    index_dir = build_base_hash_index(sf_dir)
    nb = INCR_BUCKETS

    def key(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] % 5 == 0]
        h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"].fillna("")]
        b = np.array([int(x[:8], 16) for x in h], dtype=np.int64) & (nb - 1)
        return pd.DataFrame(
            {"bucket": b, "text_hash": h, "doc_id": df["doc_id"].to_numpy()}
        )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["bucket"].iloc[0])
        files = glob.glob(f"{index_dir}/bucket={bucket}/*.parquet")
        if files:
            idx = pq.read_table(
                files, columns=["text_hash", "keep_doc_id"]
            ).to_pandas()
        else:
            idx = pd.DataFrame({"text_hash": [], "keep_doc_id": []})
        g = g.merge(idx, on="text_hash", how="left")
        delta_min = g.groupby("text_hash")["doc_id"].transform("min")
        in_base = g["keep_doc_id"].notna()
        status = np.where(
            in_base,
            "dup_of_base",
            np.where(g["doc_id"].to_numpy() != delta_min.to_numpy(),
                     "dup_in_delta", "new"),
        )
        keep = np.where(
            in_base, g["keep_doc_id"].to_numpy(), delta_min.to_numpy()
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "text_hash": g["text_hash"].to_numpy(),
                "status": status,
                "keep_doc_id": keep,
            }
        )

    out = (
        _read_docs(sf_dir)
        .map_batches(key, batch_format="pandas")
        .groupby("bucket")
        .map_groups(classify, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "keep_doc_id": "int64"}
    )


INCREMENTAL_DEDUP_SQL = """
WITH delta AS (
  SELECT doc_id, md5(COALESCE(text, '')) AS text_hash
  FROM documents WHERE doc_id % 5 = 0
),
base AS (
  SELECT md5(COALESCE(text, '')) AS text_hash, MIN(doc_id) AS base_keep
  FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1
),
dmin AS (SELECT text_hash, MIN(doc_id) AS delta_keep FROM delta GROUP BY 1)
SELECT d.doc_id, d.text_hash,
       CASE WHEN b.base_keep IS NOT NULL THEN 'dup_of_base'
            WHEN d.doc_id <> m.delta_keep THEN 'dup_in_delta'
            ELSE 'new' END AS status,
       COALESCE(b.base_keep, m.delta_keep)::BIGINT AS keep_doc_id
FROM delta d
LEFT JOIN base b USING (text_hash)
JOIN dmin m USING (text_hash)
ORDER BY doc_id
"""


# -------------------------------------------------- cross-method dedup audit
# The method-comparison table of Lee et al. (ACL'22 §5) / the Dolma paper's
# dedup ablations: run every dedup detector over the SAME corpus and report
# how many documents each one implicates — the number a pipeline owner
# reads before choosing which (combination of) detectors to pay for at
# 100 TB. Pure composition: each constituent keeps its own scale shape
# (bucketed index joins, block-pair fan-outs, broadcast bloom); this op
# adds only per-method COUNT folds over their outputs.


def dedup_method_report(sf_dir: str) -> pd.DataFrame:
    """(method, n_docs, param): documents implicated per dedup method —
    members of a >1 exact-hash group; endpoints of verified minhash /
    simhash / embedding near-dup pairs; bloom-flagged delta docs."""
    from .bloom import BLOOM_DUP_FRAC, bloom_delta_dedup

    rows = []
    ex = exact_dedup(sf_dir)
    rows.append(
        ("exact", int(ex.loc[ex["dup_count"] > 1, "dup_count"].sum()), "md5(text)")
    )
    mh = minhash_lsh_pairs(sf_dir, 0.5)
    rows.append(("minhash_lsh", len(set(mh["a"]) | set(mh["b"])), "jaccard>=0.5"))
    sh = simhash_pairs(sf_dir, 6)
    rows.append(("simhash", len(set(sh["a"]) | set(sh["b"])), "hamming<=6"))
    em = embedding_neardup_pairs(sf_dir, 0.35)
    rows.append(("embedding", len(set(em["a"]) | set(em["b"])), "cosine>=0.35"))
    bl = bloom_delta_dedup(sf_dir)
    rows.append(
        ("bloom_delta", int(bl["is_dup"].sum()), f"chunk_frac>={BLOOM_DUP_FRAC}")
    )
    out = pd.DataFrame(rows, columns=["method", "n_docs", "param"])
    return (
        out.astype({"n_docs": "int64"})
        .sort_values("method")
        .reset_index(drop=True)
    )
