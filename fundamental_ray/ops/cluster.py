"""Distributed k-means over the embeddings table — the iterative-algorithm
member of the LLM-data-pipeline family (corpus clustering for data mixing /
curriculum bucketing).

Scale shape (classic mergeable-statistics Lloyd): every iteration is ONE
streaming ``map_batches`` pass that folds per-batch partial (cluster →
count, per-dimension sum) statistics; only those k × dim partials leave the
workers (k·dim·n_blocks values — constant in corpus size per block), the
driver reduces them to the next centroid table and re-broadcasts it with
``ray.put``. The corpus itself never crosses an exchange and is never
materialized.

Determinism contract (what makes this oracle-checkable in SQL, which
iterative algorithms usually are not):
- init: centroids = the embeddings of ``vec_id 0..k-1``, rounded;
- assignment: argmin squared-Euclidean distance, ties → lowest cluster id;
- update: per-dimension mean of members, ROUNDED half-away-from-zero to 6
  decimals — the rounding quantizes away cross-engine float-summation-order
  ulps in the centroid VALUES each iteration, so numpy and the (unrolled
  CTE) DuckDB oracle track identical centroid tables. The per-vector
  distance comparison itself still happens in raw float64 on both sides,
  so a vector within ~1 ulp of equidistant between two centroids could in
  principle order differently across engines — quantization bounds the
  drift but the assignment tie-break is probabilistic-exact, the same
  contract as the registered ANN widths (empirically exact at driver
  scale, asserted by the oracle);
- a cluster with zero members drops out (never resurrected).
"""

from __future__ import annotations
from fundamental_ray.sources.parquet import read_parquet_clean

import numpy as np
import pandas as pd
import ray
import ray.data

from ..pipelines.analytics import r2

KMEANS_K = 10
KMEANS_ITERS = 3
CENT_DECIMALS = 6


def _read_emb(sf_dir: str) -> ray.data.Dataset:
    return read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _init_centroids(sf_dir: str, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(cluster_ids, centroid matrix): the first k vec_ids' vectors."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    t = (
        read_parquet_clean(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filter=pc.less(pads.field("vec_id"), k),
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    return t["vec_id"].to_numpy(np.int64), r2(mat, CENT_DECIMALS)


def _partials(df: pd.DataFrame, cref) -> pd.DataFrame:
    """Per-batch combiner: assign rows to nearest centroid, emit one row
    per non-empty cluster with (count, s0..s{dim-1}) partial sums."""
    cids, C = ray.get(cref)
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    d2 = ((mat[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)  # first min → lowest cluster id (cids sorted)
    out_rows = []
    for ci in np.unique(a):
        members = mat[a == ci]
        row = {"cluster": int(cids[ci]), "cnt": np.int64(len(members))}
        s = members.sum(axis=0)
        for j in range(mat.shape[1]):
            row[f"s{j}"] = s[j]
        out_rows.append(row)
    return pd.DataFrame(out_rows)


def _assign(df: pd.DataFrame, cref) -> pd.DataFrame:
    cids, C = ray.get(cref)
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    d2 = ((mat[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    return pd.DataFrame(
        {"vec_id": df["vec_id"].astype("int64"),
         "cluster": cids[a].astype("int64")}
    )


def _train_centroids(
    sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> tuple[np.ndarray, np.ndarray]:
    """The iters-1 Lloyd update rounds (contract: a_i assigns under
    c_{i-1}; the caller's final assignment pass is a_iters)."""
    cids, C = _init_centroids(sf_dir, k)
    emb = _read_emb(sf_dir)
    for _ in range(iters - 1):
        cref = ray.put((cids, C))
        part = emb.map_batches(
            _partials, fn_kwargs={"cref": cref}, batch_format="pandas"
        ).to_pandas()  # k × n_blocks rows — constant-bounded, documented
        agg = part.groupby("cluster", sort=True).sum()
        cids = agg.index.to_numpy(np.int64)
        sums = agg[[f"s{j}" for j in range(C.shape[1])]].to_numpy()
        C = r2(sums / agg["cnt"].to_numpy()[:, None], CENT_DECIMALS)
    return cids, C


def kmeans_clusters(
    sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> pd.DataFrame:
    """Final (vec_id, cluster) assignment after ``iters`` Lloyd rounds
    under the determinism contract above."""
    cids, C = _train_centroids(sf_dir, k, iters)
    cref = ray.put((cids, C))
    return (
        _read_emb(sf_dir)
        .map_batches(_assign, fn_kwargs={"cref": cref}, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def _kmeans_ctes(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> list:
    """The unrolled-CTE DuckDB mirror: c0 → (a1, c1) → … — shared by the
    kmeans oracle and every oracle that composes over the assignment
    (semdedup). Centroid rounding per iteration keeps both engines on
    bit-identical centroid tables (see module docstring)."""
    d = CENT_DECIMALS
    ctes = [
        # per-(vec, dim) exploded view used by every update step
        """u0 AS (
  SELECT vec_id, embedding,
         unnest(generate_series(1, len(embedding))) AS dim_idx
  FROM embeddings
), u AS (
  SELECT vec_id, dim_idx, embedding[dim_idx]::DOUBLE AS val FROM u0
)""",
        f"""c0 AS (
  SELECT vec_id AS cluster,
         list(ROUND(val, {d}) ORDER BY dim_idx) AS centroid
  FROM u WHERE vec_id < {k} GROUP BY vec_id
)""",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""a{i} AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_distance(e.embedding::DOUBLE[], c.centroid),
                      c.cluster
           ) AS rn
    FROM embeddings e CROSS JOIN c{i - 1} c
  ) WHERE rn = 1
)""")
        if i < iters:
            ctes.append(f"""c{i} AS (
  SELECT cluster, list(ROUND(avg_val, {d}) ORDER BY dim_idx) AS centroid
  FROM (
    SELECT a.cluster, u.dim_idx, SUM(u.val) / COUNT(*) AS avg_val
    FROM a{i} a JOIN u USING (vec_id)
    GROUP BY a.cluster, u.dim_idx
  ) GROUP BY cluster
)""")
    return ctes


def kmeans_clusters_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    return (
        "WITH " + ",\n".join(_kmeans_ctes(k, iters))
        + f"\nSELECT vec_id, cluster FROM a{iters} ORDER BY vec_id"
    )


KMEANS_CLUSTERS_SQL = kmeans_clusters_sql()


# --------------------------------------------------------------------------
# Per-label embedding centroids: the vector-column aggregation (mean
# pooling per class) a labeled-embedding corpus needs for classifier
# priors / cluster seeds. Scale shape: each batch folds its vectors into
# per-label (dim → sum, count) partials, so only label × dim × n_blocks
# scalars cross the ONE map-side-combined groupby; the embedding matrix
# never leaves the workers. Elements are cast float32 → float64 before
# summing (exactly what the SQL side's ::DOUBLE does), and the final mean
# is rounded half-away to 6 dp, far above either engine's summation-order
# drift (O(1)-magnitude values, corpus-bounded counts).


def label_centroids(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lab, g in df.groupby("label", sort=False):
            m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
            out.append(
                pd.DataFrame(
                    {
                        "label": np.int32(lab),
                        "dim": np.arange(m.shape[1], dtype=np.int64),
                        "s": m.sum(axis=0),
                        "n": np.int64(len(g)),
                    }
                )
            )
        if not out:  # dtype-stable empty frame
            return pd.DataFrame(
                {
                    "label": pd.Series([], dtype="int32"),
                    "dim": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype="float64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "label": agg["label"].astype("int32"),
            "dim": agg["dim"].astype("int64"),
            "n": agg["n"].astype("int64"),
            "centroid": r2(agg["s"] / agg["n"], 6),
        }
    )


LABEL_CENTROIDS_SQL = """
WITH u0 AS (
  SELECT label, embedding,
         unnest(generate_series(1, len(embedding))) AS dim_idx
  FROM embeddings
), u AS (
  SELECT label, dim_idx, embedding[dim_idx]::DOUBLE AS val FROM u0
)
SELECT label, (dim_idx - 1)::BIGINT AS dim, COUNT(*)::BIGINT AS n,
       ROUND(SUM(val) / COUNT(*), 6) AS centroid
FROM u GROUP BY label, dim_idx
"""


# --------------------------------------------------------------- SemDeDup
# Semantic dedup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication"): cluster the embedding space
# with k-means, then WITHIN each cluster drop every document that is
# ε-similar (cosine ≥ τ) to another one, keeping a canonical survivor.
# Keep rule here: a vector is dropped iff some LOWER-vec_id member of its
# cluster is ≥ τ similar ("dominated by an earlier doc") — a deterministic,
# order-free variant of the paper's greedy sweep that a plain SQL EXISTS
# can mirror (the greedy variant needs sequential recursion; the two differ
# only on chains A~B~C where cos(A,C) < τ, and keep-lowest-id is the same
# canonical-survivor convention as exact_dedup / chunk_dedup).
#
# Scale shape: the quadratic sweep runs per CLUSTER inside map_groups —
# exactly the paper's point: k grows with the corpus so cluster sizes stay
# bounded (they use ~100k clusters for LAION); the all-pairs cost is
# O(n²/k) total and each group fits a worker. One exchange (the cluster
# groupby); centroid training is the streamed Lloyd loop above.

SEMDEDUP_TAU = 0.35


def semdedup(
    sf_dir: str,
    tau: float = SEMDEDUP_TAU,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> pd.DataFrame:
    """(vec_id, cluster, kept) for every embedding row; kept=0 iff an
    earlier (lower vec_id) same-cluster vector has cosine ≥ tau."""
    cids, C = _train_centroids(sf_dir, k, iters)
    cref = ray.put((cids, C))

    def assign_keep_emb(df: pd.DataFrame) -> pd.DataFrame:
        out = _assign(df, cref)
        out["embedding"] = df["embedding"].to_numpy()
        return out

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        M = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        M = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True), 1e-30, None)
        # threshold compare on 6-dp-quantized cosines (micro-int grid,
        # mirrored by the oracle's ROUND) — the repo's new-op float
        # contract: never compare raw float against a threshold
        sims = np.floor((M @ M.T) * 1e6 + 0.5)
        # upper triangle (row j < col i): earlier-vs-later sims only
        dom = np.triu(sims >= tau * 1e6, k=1).any(axis=0)
        return pd.DataFrame(
            {
                "vec_id": g["vec_id"].to_numpy(np.int64),
                "cluster": g["cluster"].to_numpy(np.int64),
                "kept": (~dom).astype("int64"),
            }
        )

    return (
        _read_emb(sf_dir)
        .map_batches(assign_keep_emb, batch_format="pandas")
        .groupby("cluster")
        .map_groups(per_cluster, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def semdedup_sql(
    tau: float = SEMDEDUP_TAU, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> str:
    ctes = _kmeans_ctes(k, iters)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
asg AS (SELECT vec_id, cluster FROM a{iters})
SELECT e.vec_id, a.cluster,
       CASE WHEN EXISTS (
         SELECT 1 FROM asg a2 JOIN embeddings e2 ON e2.vec_id = a2.vec_id
         WHERE a2.cluster = a.cluster AND a2.vec_id < a.vec_id
           AND ROUND(list_cosine_similarity(
                 e2.embedding::DOUBLE[], e.embedding::DOUBLE[]) * 1000000)
               >= {tau} * 1000000
       ) THEN 0 ELSE 1 END AS kept
FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id
ORDER BY e.vec_id
"""
    )


SEMDEDUP_SQL = semdedup_sql()


# ------------------------------------------------------- power iteration
# Power iteration toward the top principal direction of the (uncentered)
# Gram matrix XᵀX — the streamed-sufficient-statistics member of the
# linear-algebra family (spectral embedding init, PCA whitening, SVD warm
# starts). The REGISTERED value is the deterministic k-round ITERATE (and
# its Rayleigh norm): convergence to PC1 itself depends on the spectral
# gap, and the synthetic embeddings are near-isotropic (λ2/λ1 ≈ 0.95), so
# the iterate is the well-defined oracle-checkable object — the test
# asserts the guarantees iteration actually provides (monotone Rayleigh
# growth, norm ≤ λ1, alignment strictly improving from the start).
# Each iteration is ONE map_batches pass: a block computes its
# partial Mᵀ(M·v) (a dim-vector — constant-size), the driver reduces
# n_blocks × dim scalars and re-broadcasts the normalized iterate. The
# embedding matrix never leaves the workers; per-iteration ROUND(·, 6) of
# the NORMALIZED iterate (O(1) values) absorbs cross-engine summation-
# order ulps exactly like the kmeans centroid contract above.

PI_ITERS = 5


def power_iteration_pc1(sf_dir: str, iters: int = PI_ITERS) -> pd.DataFrame:
    """(dim_idx 1-based, val) of the rounded PC1 iterate after ``iters``
    rounds from the all-ones start, plus the final Rayleigh norm estimate
    (same eigval in every row — keeps the result a single flat table)."""
    first = (
        read_parquet_clean(
            f"{sf_dir}/embeddings.parquet", columns=["embedding"]
        ).take(1)
    )
    dim = len(first[0]["embedding"])
    v = np.ones(dim, dtype=np.float64)
    emb = _read_emb(sf_dir)
    nrm = 1.0
    for _ in range(iters):
        vref = ray.put(v)

        def part(df: pd.DataFrame, _vref=vref) -> pd.DataFrame:
            vv = ray.get(_vref)
            M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            w = M.T @ (M @ vv)
            return pd.DataFrame([{f"w{j}": w[j] for j in range(len(w))}])

        wtab = (
            emb.map_batches(part, batch_format="pandas")
            .to_pandas()  # n_blocks × dim — constant-bounded
        )
        w = wtab.to_numpy(np.float64).sum(axis=0)
        nrm = float(np.sqrt((w * w).sum()))
        v = r2(w / nrm, CENT_DECIMALS)
    return pd.DataFrame(
        {
            "dim_idx": np.arange(1, dim + 1, dtype=np.int64),
            "val": v,
            "eigval_norm": np.full(dim, r2(nrm, 2)),
        }
    )


def power_iteration_sql(iters: int = PI_ITERS) -> str:
    d = CENT_DECIMALS
    ctes = [
        """u0 AS (
  SELECT vec_id, embedding,
         unnest(generate_series(1, len(embedding))) AS dim_idx
  FROM embeddings
), u AS (
  SELECT vec_id, dim_idx, embedding[dim_idx]::DOUBLE AS val FROM u0
)""",
        "p0 AS (SELECT DISTINCT dim_idx, 1.0 AS val FROM u)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""xv{i} AS MATERIALIZED (
  SELECT u.vec_id, SUM(u.val * p.val) AS xv
  FROM u JOIN p{i - 1} p USING (dim_idx)
  GROUP BY u.vec_id
)""")
        ctes.append(f"""w{i} AS MATERIALIZED (
  SELECT u.dim_idx, SUM(u.val * s.xv) AS wv
  FROM u JOIN xv{i} s USING (vec_id)
  GROUP BY u.dim_idx
)""")
        ctes.append(
            f"n{i} AS MATERIALIZED (SELECT SQRT(SUM(wv * wv)) AS nrm FROM w{i})"
        )
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT dim_idx, "
            f"ROUND(wv / (SELECT nrm FROM n{i}), {d}) AS val FROM w{i})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT p.dim_idx, p.val, (SELECT ROUND(nrm, 2) FROM n{iters}) AS eigval_norm
FROM p{iters} p ORDER BY p.dim_idx
"""
    )


POWER_ITERATION_SQL = power_iteration_sql()
