"""Product-quantization ANN (Jegou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011) — the memory-bound scale path past
SQ8: the 64-dim embedding is split into ``PQ_M`` low-dim subspaces, each
quantized against its own k-means codebook, so a stored vector becomes
``PQ_M`` small codes (~13x smaller than float64 at the registered 32x5-bit
width; the synthetic embeddings are unstructured, so finer subspaces are
needed for recall than real text embeddings would want) and search runs in the
compressed domain via ADC (asymmetric distance computation): per query,
one tiny (M x k_sub) lookup table of subspace dot products, then every
candidate's score is M table lookups — no float vector is ever touched at
scan time.

Scale shape: codebook training is the cluster_kmeans shape run for all
subspaces in ONE streaming pass — each batch folds (subspace, cluster →
count, 8 dim-sums) partials (constant M·k_sub·9 floats per block), the
driver reduces the ≤ M·k_sub rows and re-broadcasts; encode+score is a
single map_batches against the broadcast codebook with per-block top-k
(scatter-gather combiner). The corpus crosses no exchange.

Determinism contract (the cluster_kmeans contract, per subspace): init
codebooks = the subvectors of vec_id 0..k_sub-1 rounded at 6 dp;
assignment = argmin squared-Euclidean, ties → lowest code; update = member
mean ROUNDED half-away at 6 dp each iteration — so the DuckDB oracle's
unrolled CTEs track bit-identical codebooks, reproduce every vector's
codes, reconstruct the quantized vectors and re-derive the ADC ranking.
Ranking uses the 6-dp half-away-rounded cosine (the bm25/sq convention) so
summation-order ulps cannot reorder neighbors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from fundamental_ray.sources.parquet import read_parquet_clean

from ..pipelines.analytics import r2

PQ_M = 32  # subspaces (64 dims -> 32 x 2)
PQ_KSUB = 32  # centroids per subspace (5-bit codes)
PQ_ITERS = 3  # Lloyd rounds per subspace
PQ_DEC = 6  # per-iteration centroid rounding (cluster_kmeans contract)
PQ_K = 10
PQ_NQ = 5


def _read_emb(sf_dir: str) -> ray.data.Dataset:
    return read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _head_matrix(sf_dir: str, n: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    t = (
        read_parquet_clean(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filter=pc.less(pads.field("vec_id"), n),
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    return t["vec_id"].to_numpy(), np.stack(t["embedding"].to_numpy()).astype(np.float64)


def _assign_codes(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, M) code matrix: per subspace argmin squared-Euclidean, ties →
    lowest code (books: (M, k_sub, d_sub))."""
    n, dim = mat.shape
    m_, ksub, dsub = books.shape
    sub = mat.reshape(n, m_, dsub)
    codes = np.empty((n, m_), dtype=np.int64)
    for m in range(m_):
        # (n, k_sub) squared distances; argmin takes the first (lowest) code
        d2 = ((sub[:, m, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = np.argmin(d2, axis=1)
    return codes


def train_codebooks(
    sf_dir: str, m_: int = PQ_M, ksub: int = PQ_KSUB, iters: int = PQ_ITERS
) -> np.ndarray:
    """(M, k_sub, d_sub) codebook tensor after ``iters`` Lloyd rounds under
    the determinism contract; all subspaces train in the same passes."""
    _, head = _head_matrix(sf_dir, ksub)
    dim = head.shape[1]
    dsub = dim // m_
    books = r2(head.reshape(ksub, m_, dsub).transpose(1, 0, 2), PQ_DEC)
    emb = _read_emb(sf_dir)
    for _ in range(iters - 1):
        bref = ray.put(books)

        def partials(df: pd.DataFrame, bref=bref) -> pd.DataFrame:
            b = ray.get(bref)
            mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            codes = _assign_codes(mat, b)
            sub = mat.reshape(len(mat), m_, dsub)
            rows = {"m": [], "cluster": [], "cnt": []}
            rows.update({f"s{j}": [] for j in range(dsub)})
            for m in range(m_):
                for c in np.unique(codes[:, m]):
                    sel = sub[codes[:, m] == c, m, :]
                    rows["m"].append(m)
                    rows["cluster"].append(int(c))
                    rows["cnt"].append(len(sel))
                    s = sel.sum(axis=0)
                    for j in range(dsub):
                        rows[f"s{j}"].append(s[j])
            return pd.DataFrame(rows)

        part = emb.map_batches(partials, batch_format="pandas").to_pandas()
        agg = part.groupby(["m", "cluster"], sort=True).sum()
        nxt = books.copy()  # empty clusters keep their previous centroid
        for (m, c), row in agg.iterrows():
            s = row[[f"s{j}" for j in range(dsub)]].to_numpy(np.float64)
            nxt[m, c] = r2(s / row["cnt"], PQ_DEC)
        books = nxt
    return books


def pq_topk(
    sf_dir: str,
    k: int = PQ_K,
    n_queries: int = PQ_NQ,
    m_: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
) -> pd.DataFrame:
    """Top-k by cosine(query, PQ reconstruction) via ADC lookup tables;
    excludes self; rank by (cosine@6dp desc, neighbor_id asc)."""
    books = train_codebooks(sf_dir, m_, ksub, iters)
    m_, ksub, dsub = books.shape
    qids, qraw = _head_matrix(sf_dir, n_queries)
    # ADC tables: dot[m, code] per query, plus per-(m, code) squared norms
    qsub = qraw.reshape(len(qraw), m_, dsub)
    dot_tab = np.einsum("qmd,mkd->qmk", qsub, books)  # (Q, M, k_sub)
    norm2_tab = (books * books).sum(axis=2)  # (M, k_sub)
    qn = np.sqrt((qraw * qraw).sum(axis=1))  # (Q,)
    state = ray.put((books, qids, dot_tab, norm2_tab, qn))

    def block(df: pd.DataFrame) -> pd.DataFrame:
        b, bq, dt, nt, bqn = ray.get(state)
        ids = df["vec_id"].to_numpy()
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        codes = _assign_codes(mat, b)  # (n, M)
        ar = np.arange(m_)
        dots = dt[:, ar, codes].sum(axis=2)  # (Q, n): sum over M lookups
        cn = np.sqrt(nt[ar, codes].sum(axis=1))  # (n,)
        sims = r2(dots / (bqn[:, None] * cn[None, :]), 6)
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

    cand = _read_emb(sf_dir).map_batches(block, batch_format="pandas", batch_size=1024)

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


def _pq_ctes(m_: int = PQ_M, ksub: int = PQ_KSUB, iters: int = PQ_ITERS) -> list[str]:
    """Unrolled-CTE mirror of the per-subspace Lloyd training: the
    cluster_kmeans builder with (vec_id, sub) as the assignment unit.
    Empty clusters keep their previous centroid (COALESCE over c_{i-1})."""
    d = PQ_DEC
    dim_per = f"(dim_idx - 1) // {64 // m_}"
    ctes = [
        f"""u0 AS (
  SELECT vec_id, embedding,
         unnest(generate_series(1, len(embedding))) AS dim_idx
  FROM embeddings
), u AS (
  SELECT vec_id, {dim_per} AS sub, dim_idx,
         embedding[dim_idx]::DOUBLE AS val
  FROM u0
), es AS (
  SELECT vec_id, sub, list(val ORDER BY dim_idx) AS svec
  FROM u GROUP BY vec_id, sub
)""",
        f"""c0 AS (
  SELECT sub, vec_id AS cluster,
         list(ROUND(val, {d}) ORDER BY dim_idx) AS centroid
  FROM u WHERE vec_id < {ksub} GROUP BY sub, vec_id
)""",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""a{i} AS (
  SELECT vec_id, sub, cluster FROM (
    SELECT e.vec_id, e.sub, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id, e.sub
             ORDER BY list_distance(e.svec, c.centroid), c.cluster
           ) AS rn
    FROM es e JOIN c{i - 1} c ON c.sub = e.sub
  ) WHERE rn = 1
)""")
        if i < iters:
            ctes.append(f"""c{i} AS (
  SELECT p.sub, p.cluster,
         COALESCE(n.centroid, p.centroid) AS centroid
  FROM c{i - 1} p LEFT JOIN (
    SELECT sub, cluster,
           list(ROUND(avg_val, {d}) ORDER BY dim_idx) AS centroid
    FROM (
      SELECT a.sub, a.cluster, u.dim_idx,
             SUM(u.val) / COUNT(*) AS avg_val
      FROM a{i} a JOIN u ON u.vec_id = a.vec_id AND u.sub = a.sub
      GROUP BY a.sub, a.cluster, u.dim_idx
    ) GROUP BY sub, cluster
  ) n ON n.sub = p.sub AND n.cluster = p.cluster
)""")
    return ctes


def pq_topk_sql(
    k: int = PQ_K,
    n_queries: int = PQ_NQ,
    m_: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
) -> str:
    ctes = _pq_ctes(m_, ksub, iters)
    ctes.append(f"""recon AS (
  SELECT a.vec_id, a.sub, c.centroid
  FROM a{iters} a JOIN c{iters - 1} c
    ON c.sub = a.sub AND c.cluster = a.cluster
)""")
    ctes.append(f"""sims AS (
  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
         ROUND(SUM(list_inner_product(q.svec, r.centroid)) / (
           SQRT(SUM(list_inner_product(q.svec, q.svec)))
           * SQRT(SUM(list_inner_product(r.centroid, r.centroid)))), 6) AS cs
  FROM (SELECT * FROM es WHERE vec_id < {n_queries}) q
  JOIN recon r ON r.sub = q.sub AND r.vec_id <> q.vec_id
  GROUP BY q.vec_id, r.vec_id
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
, ranked AS (
  SELECT query_id, neighbor_id, cs,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cs DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank, ROUND(cs, 4) AS cosine
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""
    )


PQ_TOPK_SQL = pq_topk_sql()
