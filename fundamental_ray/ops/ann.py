"""Similarity search over the embeddings table: brute-force cosine top-k
(the exactness baseline) and an IVF-bucketed variant (the scale path).

Brute force: the normalized corpus matrix is broadcast once via ray.put;
each map_batches task multiplies its query block against it (numpy matmul —
vectorized, zero-copy reads). Exact by construction.

IVF: k-means-style coarse centroids chosen deterministically (first
``n_centroids`` vectors after one Lloyd sweep), vectors assigned to their
nearest centroid bucket, queries probe the ``n_probe`` nearest buckets.
Recall measured against the brute-force baseline in tests; at 10^10 vectors
the buckets become the partition key and only probed buckets are read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _load_matrix(sf_dir: str):
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas().sort_values("vec_id").reset_index(drop=True)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30, None)
    return emb["vec_id"].to_numpy(), matn


def brute_force_topk(
    sf_dir: str, k: int = 10, n_queries: int = 5
) -> pd.DataFrame:
    """Top-k cosine neighbors (excluding self) for the first ``n_queries``
    vec_ids; deterministic tiebreak (sim desc, neighbor vec_id asc)."""
    import ray

    ids, matn = _load_matrix(sf_dir)
    ref = ray.put((ids, matn))
    queries = pd.DataFrame({"query_id": ids[:n_queries]})

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, m = ray.get(ref)
        pos = {d: i for i, d in enumerate(all_ids)}
        out = {"query_id": [], "neighbor_id": [], "rank": [], "cosine": []}
        for q in batch["query_id"]:
            i = pos[q]
            sims = m[i] @ m.T
            sims[i] = -np.inf  # exclude self
            order = np.lexsort((all_ids, -sims))[:k]
            for r, j in enumerate(order, start=1):
                out["query_id"].append(int(q))
                out["neighbor_id"].append(int(all_ids[j]))
                out["rank"].append(r)
                out["cosine"].append(round(float(sims[j]), 4))
        return pd.DataFrame(out)

    return (
        ray.data.from_pandas(queries)
        .map_batches(block, batch_format="pandas", batch_size=64)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


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


def ivf_topk(
    sf_dir: str, k: int = 10, n_queries: int = 5,
    n_centroids: int = 16, n_probe: int = 4,
) -> pd.DataFrame:
    """IVF approximate top-k: coarse quantize (one deterministic Lloyd sweep
    from evenly-strided seeds), probe the n_probe nearest buckets per query.
    Same output schema as brute_force_topk."""
    import ray

    ids, matn = _load_matrix(sf_dir)
    n = len(ids)
    stride = max(1, n // n_centroids)
    cents = matn[::stride][:n_centroids].copy()
    # one Lloyd sweep for stability (deterministic, no RNG)
    assign = np.argmax(matn @ cents.T, axis=1)
    for c in range(len(cents)):
        members = matn[assign == c]
        if len(members):
            v = members.mean(axis=0)
            cents[c] = v / max(np.linalg.norm(v), 1e-30)
    assign = np.argmax(matn @ cents.T, axis=1)
    ref = ray.put((ids, matn, cents, assign))

    queries = pd.DataFrame({"query_id": ids[:n_queries]})

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, m, C, A = ray.get(ref)
        pos = {d: i for i, d in enumerate(all_ids)}
        out = {"query_id": [], "neighbor_id": [], "rank": [], "cosine": []}
        for q in batch["query_id"]:
            i = pos[q]
            probe = np.argsort(-(C @ m[i]))[:n_probe]
            mask = np.isin(A, probe)
            mask[i] = False
            cand = np.nonzero(mask)[0]
            sims = m[cand] @ m[i]
            order = np.lexsort((all_ids[cand], -sims))[:k]
            for r, o in enumerate(order, start=1):
                j = cand[o]
                out["query_id"].append(int(q))
                out["neighbor_id"].append(int(all_ids[j]))
                out["rank"].append(r)
                out["cosine"].append(round(float(sims[o]), 4))
        return pd.DataFrame(out)

    return (
        ray.data.from_pandas(queries)
        .map_batches(block, batch_format="pandas", batch_size=64)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
