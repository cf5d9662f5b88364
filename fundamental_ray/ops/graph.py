"""Distributed PageRank over a bipartite part↔supplier link graph — the
graph-iteration member of the LLM-data-pipeline family (link-authority
scoring of a crawled web graph; at 100 TB this is the "rank the frontier by
authority" step the reference's priority queue would consume).

Scale shape (rank-push as bucket-aligned cogroups): the edge list and the
rank vector are both Ray Datasets, never driver-resident. Nodes hash into
``_B`` buckets on the SAME key both tables carry, so joining rank[src] onto
the out-edges of src is a union + ``groupby(bucket).map_groups`` cogroup —
no hash-join actor pools, just the sort-based exchange every other op in
this repo rides. Every iteration is exactly two exchanges of edge-bounded
rows:

    (edges ∪ ranks) groupby src-bucket → map rank onto edges, emit
        per-bucket PARTIAL contribution sums per dst  (map-side combine:
        ≤ distinct-dst rows leave each bucket, not edge-count rows)
    → groupby dst-bucket → merge partials, damp, round

The degree is folded into the edge rows at build time (edges are bucketed
by src, so a src's whole adjacency is bucket-local and deg needs no join).
The edge list is materialized once into the object store (distributed,
spillable) because every iteration consumes it — a lazy DAG would re-run
the distinct shuffle per iteration.

Determinism contract (what makes an iterative float algorithm
oracle-checkable, same convention as ops/cluster.py kmeans):
- the graph is symmetrized (both directions of every distinct
  (part, supplier) lineitem pair), so every node has out-degree ≥ 1 —
  no dangling-mass term — and every node receives contributions, so the
  rank vector's node set is closed under iteration;
- ranks are ROUNDED half-away-from-zero to 12 decimals after every
  update (and at init), quantizing away float-summation-order ulps
  between the two-level partial sums here and the single SQL SUM
  (per-node in-sums are ≤ a few hundred terms of ~1e-4 magnitude —
  drift ~1e-15 ≪ 0.5e-12);
- damping applied as ``(1-d)/n + d * sum`` with the same operation order
  on both sides.

Reference analogy: FundaMental's scheduler orders the frontier by
depth/priority (scheduler.go:209-243); PageRank is the authority-based
ordering a web-scale crawler of the same shape would plug into that queue.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..pipelines.analytics import _read, r2

PAGERANK_ITERS = 3
PAGERANK_D = 0.85
RANK_DECIMALS = 12
SUPPLIER_OFFSET = 10_000_000  # node id space: parts as-is, suppliers offset
_B = 64  # node-hash bucket count (tasks per exchange; raise with cluster)


def _edges_deg(sf_dir: str) -> ray.data.Dataset:
    """Distinct symmetric edges with out-degree attached:
    (bucket, src, dst, deg). One exchange; dedup and degree both happen
    bucket-locally because bucketing is by src."""
    import pyarrow as pa

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def both_directions(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        p = pc.cast(t["l_partkey"], pa.int64()).combine_chunks()
        s = pc.add(
            pc.cast(t["l_suppkey"], pa.int64()), SUPPLIER_OFFSET
        ).combine_chunks()
        src = pa.concat_arrays([p, s])
        dst = pa.concat_arrays([s, p])
        bucket = pc.cast(pc.bit_wise_and(src, _B - 1), pa.int32())
        return pa.table({"bucket": bucket, "src": src, "dst": dst})

    def dedup_and_degree(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["src", "dst"])
        g = g.assign(deg=g.groupby("src")["src"].transform("size").astype("int64"))
        return g

    return (
        ds.map_batches(both_directions, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dedup_and_degree, batch_format="pandas")
        .materialize()
    )


def pagerank(
    sf_dir: str, iters: int = PAGERANK_ITERS, d: float = PAGERANK_D
) -> pd.DataFrame:
    """(node, rank) after ``iters`` rank-push rounds under the contract."""
    edges = _edges_deg(sf_dir)

    def bucket_nodes(g: pd.DataFrame) -> pd.DataFrame:
        nodes = g["src"].drop_duplicates()
        return pd.DataFrame(
            {"bucket": g["bucket"].iloc[0], "node": nodes.astype("int64")}
        )

    nodes = edges.groupby("bucket").map_groups(
        bucket_nodes, batch_format="pandas"
    ).materialize()
    n = nodes.count()
    base = (1.0 - d) / n
    init = float(r2(1.0 / n, RANK_DECIMALS))

    # union-cogroup schema: kind 0 = edge row, kind 1 = rank row (in `src`)
    def edges_tagged(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": df["bucket"],
                "kind": np.int8(0),
                "src": df["src"],
                "dst": df["dst"],
                "deg": df["deg"],
                "rank": np.nan,
            }
        )

    def ranks_tagged(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": df["bucket"],
                "kind": np.int8(1),
                "src": df["node"],
                "dst": np.int64(-1),
                "deg": np.int64(0),
                "rank": df["rank"],
            }
        )

    edges_u = edges.map_batches(edges_tagged, batch_format="pandas").materialize()
    ranks = nodes.map_batches(
        lambda df: pd.DataFrame(
            {"bucket": df["bucket"], "node": df["node"], "rank": init}
        ),
        batch_format="pandas",
    )

    def push(g: pd.DataFrame) -> pd.DataFrame:
        r = g.loc[g["kind"] == 1].set_index("src")["rank"]
        e = g.loc[g["kind"] == 0]
        c = e["src"].map(r).to_numpy() / e["deg"].to_numpy()
        part = (
            pd.DataFrame({"dst": e["dst"].to_numpy(), "c": c})
            .groupby("dst", sort=False)["c"]
            .sum()
            .reset_index()
        )
        part["bucket"] = (part["dst"] & (_B - 1)).astype("int32")
        return part[["bucket", "dst", "c"]]

    def merge_damp(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("dst", sort=False)["c"].sum()
        return pd.DataFrame(
            {
                "bucket": g["bucket"].iloc[0],
                "node": s.index.to_numpy(np.int64),
                "rank": r2(base + d * s.to_numpy(), RANK_DECIMALS),
            }
        )

    for _ in range(iters):
        u = edges_u.union(ranks.map_batches(ranks_tagged, batch_format="pandas"))
        ranks = (
            u.groupby("bucket")
            .map_groups(push, batch_format="pandas")
            .groupby("bucket")
            .map_groups(merge_damp, batch_format="pandas")
        )

    out = ranks.to_pandas()[["node", "rank"]]
    return out.sort_values("node").reset_index(drop=True)


def pagerank_sql(iters: int = PAGERANK_ITERS, d: float = PAGERANK_D) -> str:
    """Unrolled-CTE DuckDB mirror — same init, per-iteration rounding, and
    damping operation order as the Ray side."""
    nd = RANK_DECIMALS
    ctes = [
        f"""e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
edges AS (
  SELECT p AS src, s + {SUPPLIER_OFFSET} AS dst FROM e0
  UNION ALL
  SELECT s + {SUPPLIER_OFFSET} AS src, p AS dst FROM e0
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT COUNT(*)::DOUBLE AS n FROM deg),
r0 AS (SELECT src AS node, ROUND(1.0 / (SELECT n FROM nn), {nd}) AS rank FROM deg)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT e.dst AS node,
         ROUND((1.0 - {d}) / (SELECT n FROM nn)
               + {d} * SUM(r.rank / dg.deg), {nd}) AS rank
  FROM edges e
  JOIN r{i - 1} r ON r.node = e.src
  JOIN deg dg ON dg.src = e.src
  GROUP BY e.dst
)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, rank FROM r{iters} ORDER BY node"
    )


PAGERANK_SQL = pagerank_sql()
