"""Distributed PageRank over a bipartite part↔supplier link graph — the
graph-iteration member of the LLM-data-pipeline family (link-authority
scoring of a crawled web graph; at 100 TB this is the "rank the frontier by
authority" step the reference's priority queue would consume).

Scale shape (rank-push over a bucket-partitioned edge index — the
fetch-index pattern applied to graphs): the edge list pays its shuffle
ONCE, at build time — deduped, degree-annotated (edges are bucketed by
src, so a src's whole adjacency is bucket-local and deg needs no join) and
written as bucket-partitioned parquet. After that, iterations never touch
an edge-scale exchange again: the rank vector (a node-scale Dataset) is
grouped by its bucket, each bucket task point-reads ITS edge partition
from the index, maps rank[src] onto the adjacency vectorized, and emits
per-dst PARTIAL contribution sums (map-side combine: ≤ distinct-dst rows
leave each bucket); a second node-scale groupby merges partials, damps and
rounds. Per iteration the exchanges move O(nodes + partials) rows — the
edge list, the overwhelmingly largest table, stays on (distributed) disk
and is only ever read bucket-locally. A naive re-shuffle-edges-per-round
union cogroup was 4× slower at sf0.1 (40 s → see bench history).

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


def build_edge_index(sf_dir: str, num_buckets: int = _B) -> str:
    """Bucket-partitioned (src, dst, deg) edge store — distinct symmetric
    edges with out-degree attached; idempotent per (corpus, params) like
    build_inverted_index. Dedup and degree happen bucket-locally because
    the partition key is hash(src)."""
    import os

    import pyarrow as pa

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/fr_pagerank_edges/{tag}-b{num_buckets}-v1"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def both_directions(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        p = pc.cast(t["l_partkey"], pa.int64()).combine_chunks()
        s = pc.add(
            pc.cast(t["l_suppkey"], pa.int64()), SUPPLIER_OFFSET
        ).combine_chunks()
        src = pa.concat_arrays([p, s])
        dst = pa.concat_arrays([s, p])
        bucket = pc.cast(pc.bit_wise_and(src, num_buckets - 1), pa.int32())
        return pa.table({"bucket": bucket, "src": src, "dst": dst})

    def dedup_and_degree(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["src", "dst"])
        g = g.assign(deg=g.groupby("src")["src"].transform("size").astype("int64"))
        return g

    (
        ds.map_batches(both_directions, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dedup_and_degree, batch_format="pandas")
        .write_parquet(out, partition_cols=["bucket"])
    )
    with open(done, "w") as fh:
        fh.write("ok")
    return out


def _bucket_edge_files(edge_dir: str, bucket: int) -> list[str]:
    import glob

    return sorted(glob.glob(f"{edge_dir}/bucket={bucket}/*.parquet"))


def _read_bucket_edges(edge_dir: str, bucket: int) -> pd.DataFrame:
    import pyarrow.parquet as pq

    files = _bucket_edge_files(edge_dir, bucket)
    return pq.read_table(files, columns=["src", "dst", "deg"]).to_pandas()


def _push_slices(e: pd.DataFrame, rank) -> tuple:
    """Per-dst-bucket partial contribution tables for one src bucket.
    ``rank`` is either the uniform init scalar or this bucket's
    node-indexed rank Series. Map-side combine: one row per distinct dst."""
    import pyarrow as pa

    if isinstance(rank, float):
        c = rank / e["deg"].to_numpy()
    else:
        c = e["src"].map(rank).to_numpy() / e["deg"].to_numpy()
    part = (
        pd.DataFrame({"dst": e["dst"].to_numpy(), "c": c})
        .groupby("dst", sort=False)["c"]
        .sum()
        .reset_index()
    )
    part["b"] = part["dst"].to_numpy() & (_B - 1)
    by_b = dict(tuple(part.groupby("b", sort=False)))
    out = []
    for b in range(_B):
        sub = by_b.get(b)
        if sub is None:
            out.append(pa.table({"dst": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.float64())}))
        else:
            out.append(pa.table({"dst": sub["dst"].to_numpy(np.int64),
                                 "c": sub["c"].to_numpy(np.float64)}))
    return tuple(out)


def _merge_rank(slices, base: float, d: float) -> pd.Series:
    """Damped, rounded rank for one dst bucket from its addressed partials."""
    import pyarrow as pa

    df = pa.concat_tables(slices).to_pandas()
    s = df.groupby("dst", sort=False)["c"].sum()
    return pd.Series(
        r2(base + d * s.to_numpy(), RANK_DECIMALS),
        index=s.index.to_numpy(np.int64),
    )


import ray as _ray


@_ray.remote(num_cpus=1)
def _pr_node_count(edge_dir: str, bucket: int) -> int:
    return int(_read_bucket_edges(edge_dir, bucket)["src"].nunique())


@_ray.remote(num_cpus=1)
def _pr_push_init(edge_dir: str, bucket: int, init: float):
    return _push_slices(_read_bucket_edges(edge_dir, bucket), init)


@_ray.remote(num_cpus=1)
def _pr_merge_push(edge_dir: str, bucket: int, base: float, d: float, *slices):
    rank = _merge_rank(slices, base, d)
    return _push_slices(_read_bucket_edges(edge_dir, bucket), rank)


@_ray.remote(num_cpus=1)
def _pr_merge_final(base: float, d: float, *slices):
    import pyarrow as pa

    rank = _merge_rank(slices, base, d)
    return pa.table(
        {"node": rank.index.to_numpy(np.int64), "rank": rank.to_numpy(np.float64)}
    )


def pagerank(
    sf_dir: str, iters: int = PAGERANK_ITERS, d: float = PAGERANK_D
) -> pd.DataFrame:
    """(node, rank) after ``iters`` rank-push rounds under the contract.

    The iteration loop is the frontier claim-path pattern (crawl/frontier.py):
    each src-bucket task emits its partial contribution sums PRE-ROUTED into
    one plasma slice per dst bucket (``num_returns=_B``), and each dst-bucket
    task of the next round consumes exactly its addressed slices — a
    task-level all-to-all with zero driver transit and no per-round sort
    (Dataset ``groupby`` exchanges pay sample+sort latency per round on a
    vector that never needs ordering; measured 2-4× slower here). The driver
    holds only ObjectRefs (``_B²`` per round), never data."""
    import ray

    edge_dir = build_edge_index(sf_dir)
    buckets = [b for b in range(_B) if _bucket_edge_files(edge_dir, b)]

    n = sum(ray.get([_pr_node_count.remote(edge_dir, b) for b in buckets]))
    base = (1.0 - d) / n
    init = float(r2(1.0 / n, RANK_DECIMALS))

    opts = {"num_returns": _B}
    # slices[i][b] = partial table produced by bucket `buckets[i]`,
    # addressed to dst bucket b
    slices = [
        _pr_push_init.options(**opts).remote(edge_dir, b, init) for b in buckets
    ]
    for _ in range(iters - 1):
        slices = [
            _pr_merge_push.options(**opts).remote(
                edge_dir, b, base, d, *[s[b] for s in slices]
            )
            for b in buckets
        ]
    finals = [
        _pr_merge_final.remote(base, d, *[s[b] for s in slices]) for b in buckets
    ]
    import pyarrow as pa

    out = pa.concat_tables(ray.get(finals)).to_pandas()
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
