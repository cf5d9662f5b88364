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
from fundamental_ray.state.diskcache import cache_valid, mark_done, source_fingerprint

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
    fp = source_fingerprint(
        f"{sf_dir}/lineitem.parquet", extra=f"edges-b{num_buckets}-v1"
    )
    if cache_valid(out, fp):
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
    mark_done(out, fp)
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
    if isinstance(rank, float):
        c = rank / e["deg"].to_numpy()
    else:
        c = e["src"].map(rank).to_numpy() / e["deg"].to_numpy()
    return _route_partials(e["dst"].to_numpy(), c)


def _route_partials(dst: np.ndarray, c: np.ndarray) -> tuple:
    """Map-side combine + slice routing shared by pagerank and HITS:
    per-dst partial sums packed into one Arrow table per dst bucket."""
    import pyarrow as pa

    part = (
        pd.DataFrame({"dst": dst, "c": c})
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


# ---------------------------------------------------------- triangle count
# Distributed triangle counting (node-iterator MapReduce form — Suri &
# Vassilvitskii 2011 "Counting Triangles and the Curse of the Last
# Reducer") on the thresholded co-supplier projection: suppliers are
# linked when they co-supply at least the 75th-percentile number of
# shared parts (a scale-relative threshold — an absolute one degenerates
# to the complete graph at one sf and the empty graph at another).
# Honest cost note: the co-supply projection is DENSE (every supplier
# pair shares parts at TPC-H scales), so the wedge exchange carries
# Θ(wedges) rows — that is the inherent cost of EXACT global clustering
# on a dense graph, not an avoidable shuffle; at web scale this op is
# meant for sparse link graphs where wedges ≈ Σ deg² stays small, and
# the groupby stages below run as 64-bucket folds (never one task per
# entity) so density costs compute, not task overhead.
#
# Scale shape:
#   1. bip: DISTINCT (part, supplier) — one combiner exchange.
#   2. pairs: per-part supplier fan-out (groupby part; fan-out bounded by
#      suppliers-per-part², the projection's inherent cost) + one count
#      exchange. The pair table is entity²-bounded (suppliers ≪ rows),
#      so the MEDIAN threshold is computed from it driver-side — the
#      same bounded-table contract as the kmeans partials.
#   3. wedges: edges grouped by MIDDLE node emit ordered 2-paths
#      (u < m < w) — each triangle has exactly ONE ordered middle.
#   4. closure: wedge candidates and edges hash-bucketed by the (u, w)
#      pair key; one exchange; per-bucket merge counts closed wedges.
# Output: one row of exact integer counts + the 6-dp closure ratio.

TRI_BUCKETS = 64


def _cosupplier_edges(sf_dir: str) -> pd.DataFrame:
    """Thresholded co-supplier projection shared by triangle_count and
    link_prediction: (part, supplier) rows bucket by part — exact dedup
    AND the per-part pair fan-out happen inside the bucket fold — and
    pairs at or above the 75th-percentile co-occurrence count become
    undirected edges (u < v). The pair table is entity²-bounded, so the
    threshold folds on the driver (kmeans-partials contract)."""
    bip = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
        lambda df: df.rename(columns={"l_partkey": "p", "l_suppkey": "s"})
        .drop_duplicates()
        .assign(pb=lambda d: (d["p"] % TRI_BUCKETS).astype("int64")),
        batch_format="pandas",
    )

    def pair_bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        # bucket-local: exact (p, s) dedup + per-part-segment pair
        # fan-out in one sort — the bucketized fold idiom (a map_groups
        # per PART would spawn millions of tiny pandas groups at scale)
        g = g.drop_duplicates(["p", "s"]).sort_values(["p", "s"])
        ps = g["p"].to_numpy(np.int64)
        ss = g["s"].to_numpy(np.int64)
        seg = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1], True])
        xs, ys = [], []
        for a, b in zip(seg[:-1], seg[1:]):
            part = ss[a:b]
            ii, jj = np.triu_indices(len(part), k=1)
            xs.append(part[ii])
            ys.append(part[jj])
        x = np.concatenate(xs) if xs else np.array([], np.int64)
        y = np.concatenate(ys) if ys else np.array([], np.int64)
        out = (
            pd.DataFrame({"x": x, "y": y})
            .groupby(["x", "y"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        return out.astype({"x": "int64", "y": "int64", "c": "int64"})

    pairs = (
        bip.groupby("pb")
        .map_groups(pair_bucket_fold, batch_format="pandas")
        .to_pandas()  # suppliers² — entity-bounded, documented
        .groupby(["x", "y"], as_index=False)
        .sum()
    )
    if not len(pairs):
        return pd.DataFrame(
            {"u": pd.Series([], dtype="int64"), "v": pd.Series([], dtype="int64")}
        )
    thresh = float(np.percentile(pairs["c"].to_numpy(np.float64), 75, method="linear"))
    return (
        pairs[pairs["c"] >= thresh][["x", "y"]]
        .rename(columns={"x": "u", "y": "v"})
        .reset_index(drop=True)
    )


def triangle_count(sf_dir: str) -> pd.DataFrame:
    """Two exchanges total: (1) the shared co-supplier projection
    (_cosupplier_edges). (2) edge incidence buckets by middle node — the
    wedge fold counts closure against the broadcast edge set in place
    (the edge set is the same entity²-bounded table). For entity counts
    whose pair table exceeds driver memory, swap the driver fold for a
    (x, y) count exchange and the broadcast for the bucketed pair-key
    join — the exchange structure is unchanged."""
    edges = _cosupplier_edges(sf_dir)
    if not len(edges):
        return pd.DataFrame(
            {"n_edges": [0], "n_wedges": [0], "n_triangles": [0],
             "closure": [0.0]}
        ).astype({"n_edges": "int64", "n_wedges": "int64", "n_triangles": "int64"})
    n_edges = len(edges)
    edge_ref = ray.put(set(zip(edges["u"].tolist(), edges["v"].tolist())))
    eds = ray.data.from_pandas(edges)

    # incidence: each edge appears in both endpoints' middle-node groups
    def to_incidence(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "m": np.concatenate([df["v"].to_numpy(), df["u"].to_numpy()]),
                "other": np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()]),
                "is_lo": np.concatenate(
                    [np.ones(len(df), np.int64), np.zeros(len(df), np.int64)]
                ),
            }
        )
        out["mb"] = (out["m"] % TRI_BUCKETS).astype("int64")
        return out

    def wedge_bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        eset = ray.get(edge_ref)
        g = g.sort_values(["m", "is_lo"])
        ms = g["m"].to_numpy(np.int64)
        other = g["other"].to_numpy(np.int64)
        is_lo = g["is_lo"].to_numpy(np.int64)
        seg = np.flatnonzero(np.r_[True, ms[1:] != ms[:-1], True])
        wedges = 0
        closed = 0
        for a, b in zip(seg[:-1], seg[1:]):
            lo = other[a:b][is_lo[a:b] == 1]
            hi = other[a:b][is_lo[a:b] == 0]
            if len(lo) and len(hi):
                wedges += len(lo) * len(hi)
                closed += sum(
                    (u, w) in eset
                    for u in lo.tolist()
                    for w in hi.tolist()
                )
        return pd.DataFrame({"wedges": [wedges], "closed": [closed]})

    agg = (
        eds.map_batches(to_incidence, batch_format="pandas")
        .groupby("mb")
        .map_groups(wedge_bucket_fold, batch_format="pandas")
        .to_pandas()  # TRI_BUCKETS rows
    )
    n_wedges = int(agg["wedges"].sum())
    n_tri = int(agg["closed"].sum())
    return pd.DataFrame(
        {
            "n_edges": [n_edges],
            "n_wedges": [n_wedges],
            "n_triangles": [n_tri],
            "closure": [float(r2(n_tri / n_wedges, 6)) if n_wedges else 0.0],
        }
    ).astype({"n_edges": "int64", "n_wedges": "int64", "n_triangles": "int64"})


TRIANGLE_COUNT_SQL = """
WITH bip AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
pairs AS (
  SELECT a.s AS x, b.s AS y, COUNT(*) AS c
  FROM bip a JOIN bip b ON a.p = b.p AND a.s < b.s
  GROUP BY a.s, b.s
),
med AS (SELECT quantile_cont(c, 0.75) AS m FROM pairs),
e AS (SELECT x AS u, y AS v FROM pairs, med WHERE c >= m),
w AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM e e1 JOIN e e2 ON e1.v = e2.u)
SELECT (SELECT COUNT(*) FROM e)::BIGINT AS n_edges,
       (SELECT COUNT(*) FROM w)::BIGINT AS n_wedges,
       (SELECT COUNT(*) FROM w JOIN e ON e.u = w.a AND e.v = w.c)::BIGINT
         AS n_triangles,
       ROUND((SELECT COUNT(*) FROM w JOIN e ON e.u = w.a AND e.v = w.c)
             / (SELECT COUNT(*) FROM w)::DOUBLE, 6) AS closure
"""


# ----------------------------------------------------------------- HITS
# Hubs & authorities (Kleinberg 1999) on the DIRECTED bipartite link graph
# parts → suppliers: the companion authority model to pagerank above — a
# web-scale crawler ranks index/listing pages (hubs) separately from
# content pages (authorities), exactly this alternating shape. Reuses the
# bucket-partitioned edge index (one build-time shuffle, then every
# iteration point-reads its bucket), the plasma pre-routed slice exchange
# (num_returns=_B, zero driver transit), and pagerank's determinism
# contract. Normalization is by the GLOBAL MAX of the 12-dp-rounded raw
# scores — max is order-independent (unlike an L2/L1 norm's sum), so the
# only float-order surface is the bounded per-node in-sum, quantized away
# by the same 12-dp rounding argument as pagerank.
HITS_ITERS = 3


@_ray.remote(num_cpus=1)
def _hits_push(edge_dir: str, bucket: int, scores, gmax: float, part_side: bool):
    """Push (scores/gmax, rounded) across this bucket's edges whose src is
    the given node class; scores=None means the all-ones hub init."""
    e = _read_bucket_edges(edge_dir, bucket)
    mask = (e["src"] < SUPPLIER_OFFSET) if part_side else (e["src"] >= SUPPLIER_OFFSET)
    e = e[mask]
    if scores is None:
        c = np.ones(len(e), dtype=np.float64)
    else:
        norm = pd.Series(
            r2(scores.to_numpy(np.float64) / gmax, RANK_DECIMALS),
            index=scores.index,
        )
        c = e["src"].map(norm).to_numpy(np.float64)
    return _route_partials(e["dst"].to_numpy(), c)


@_ray.remote(num_cpus=2)
def _hits_merge(*slices):
    """Raw-rounded per-node score for one dst bucket + its local max."""
    rank = _merge_rank(slices, 0.0, 1.0)
    return rank, (float(rank.max()) if len(rank) else -np.inf)


@_ray.remote(num_cpus=1)
def _hits_final(scores, gmax: float, offset: int):
    import pyarrow as pa

    return pa.table(
        {
            "node": scores.index.to_numpy(np.int64) - offset,
            "score": r2(scores.to_numpy(np.float64) / gmax, RANK_DECIMALS),
        }
    )


def hits(sf_dir: str, iters: int = HITS_ITERS) -> pd.DataFrame:
    """(kind, node, score): hub scores for parts, authority scores for
    suppliers, after ``iters`` alternating max-normalized updates.

    Per half-step the driver holds only _B object refs and _B local-max
    scalars (the normalization barrier HITS inherently requires); edges
    never leave their bucket partitions."""
    import ray
    import pyarrow as pa

    edge_dir = build_edge_index(sf_dir)
    buckets = [b for b in range(_B) if _bucket_edge_files(edge_dir, b)]
    opts = {"num_returns": _B}

    def merge(slices):
        merged = [
            _hits_merge.options(num_returns=2).remote(*[s[b] for s in slices])
            for b in buckets
        ]
        score_refs = [m[0] for m in merged]
        gmax = max(ray.get([m[1] for m in merged]))
        return score_refs, gmax

    # a_1 partials from the all-ones hub init
    slices = [
        _hits_push.options(**opts).remote(edge_dir, b, None, 1.0, True)
        for b in buckets
    ]
    for k in range(1, iters + 1):
        a_refs, a_max = merge(slices)  # authority_k
        slices = [
            _hits_push.options(**opts).remote(edge_dir, b, a_refs[i], a_max, False)
            for i, b in enumerate(buckets)
        ]
        h_refs, h_max = merge(slices)  # hub_k
        if k < iters:
            slices = [
                _hits_push.options(**opts).remote(edge_dir, b, h_refs[i], h_max, True)
                for i, b in enumerate(buckets)
            ]

    auth = pa.concat_tables(
        ray.get([_hits_final.remote(r, a_max, SUPPLIER_OFFSET) for r in a_refs])
    ).to_pandas()
    hub = pa.concat_tables(
        ray.get([_hits_final.remote(r, h_max, 0) for r in h_refs])
    ).to_pandas()
    auth.insert(0, "kind", "authority")
    hub.insert(0, "kind", "hub")
    out = pd.concat([auth, hub], ignore_index=True)
    return out.sort_values(["kind", "node"]).reset_index(drop=True)


def hits_sql(iters: int = HITS_ITERS) -> str:
    """Unrolled-CTE DuckDB mirror: identical init, per-update 12-dp
    rounding, and max-normalization order."""
    nd = RANK_DECIMALS
    ctes = [
        """e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
h0 AS (SELECT DISTINCT p AS node, 1.0 AS v FROM e0)"""
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""a{k}r AS (
  SELECT e.s AS node, ROUND(SUM(h.v), {nd}) AS r
  FROM e0 e JOIN h{k - 1} h ON h.node = e.p GROUP BY e.s
),
a{k} AS (SELECT node, ROUND(r / (SELECT MAX(r) FROM a{k}r), {nd}) AS v FROM a{k}r),
h{k}r AS (
  SELECT e.p AS node, ROUND(SUM(a.v), {nd}) AS r
  FROM e0 e JOIN a{k} a ON a.node = e.s GROUP BY e.p
),
h{k} AS (SELECT node, ROUND(r / (SELECT MAX(r) FROM h{k}r), {nd}) AS v FROM h{k}r)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT 'authority' AS kind, node, v AS score FROM a{iters}
UNION ALL SELECT 'hub' AS kind, node, v AS score FROM h{iters}
ORDER BY kind, node"""
    )


HITS_SQL = hits_sql()


# ------------------------------------------------------- link prediction
# Common-neighbor / Jaccard link prediction on the thresholded
# co-supplier projection (Liben-Nowell & Kleinberg 2003): for node pairs
# NOT currently connected, score = |N(u) ∩ N(w)| / |N(u) ∪ N(w)| — the
# crawler-adjacent use is "which hosts will link next" / related-entity
# suggestion over a link graph. Scores are integer-exact until ONE final
# division (cn, deg_u, deg_w are counts), so the 6-dp round mirrors.
#
# Scale shape: same bucketized-fold plan as triangle_count — symmetrized
# edge incidence buckets by MIDDLE node (one exchange), each bucket fold
# emits per-(x, y) partial common-neighbor counts vectorized
# (np.triu_indices over each middle's sorted neighbor segment), one
# (x, y) groupby-sum exchange merges them. The candidate table is
# entity²-bounded (same documented bound as the pair/edge tables here);
# existing edges and degrees broadcast as bounded dicts.
LINKPRED_TOPK = 30


def link_prediction(sf_dir: str) -> pd.DataFrame:
    """Top-k non-edge pairs by Jaccard common-neighbor score (ties:
    cn desc, then u, w asc — pinned on both sides)."""
    edges = _cosupplier_edges(sf_dir)
    if not len(edges):
        return pd.DataFrame(
            {"u": pd.Series([], dtype="int64"), "w": pd.Series([], dtype="int64"),
             "cn": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    deg = (
        pd.concat([edges["u"], edges["v"]]).value_counts().to_dict()
    )
    edge_set = set(zip(edges["u"].tolist(), edges["v"].tolist()))
    eds = ray.data.from_pandas(edges.reset_index(drop=True))

    def to_incidence(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "m": np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()]),
                "nb": np.concatenate([df["v"].to_numpy(), df["u"].to_numpy()]),
            }
        )
        out["mb"] = (out["m"] % TRI_BUCKETS).astype("int64")
        return out.astype({"m": "int64", "nb": "int64"})

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["m", "nb"])
        ms = g["m"].to_numpy(np.int64)
        nb = g["nb"].to_numpy(np.int64)
        seg = np.flatnonzero(np.r_[True, ms[1:] != ms[:-1], True])
        xs, ys = [], []
        for a, b in zip(seg[:-1], seg[1:]):
            nbr = nb[a:b]
            ii, jj = np.triu_indices(len(nbr), k=1)
            xs.append(nbr[ii])
            ys.append(nbr[jj])
        x = np.concatenate(xs) if xs else np.array([], np.int64)
        y = np.concatenate(ys) if ys else np.array([], np.int64)
        out = (
            pd.DataFrame({"x": x, "y": y})
            .groupby(["x", "y"], as_index=False)
            .size()
            .rename(columns={"size": "cn"})
        )
        return out.astype({"x": "int64", "y": "int64", "cn": "int64"})

    cn = (
        eds.map_batches(to_incidence, batch_format="pandas")
        .groupby("mb")
        .map_groups(wedge_pairs, batch_format="pandas")
        .to_pandas()  # entity²-bounded candidate table, documented
        .groupby(["x", "y"], as_index=False)["cn"].sum()
    )
    cn = cn[~cn.apply(lambda r: (r["x"], r["y"]) in edge_set, axis=1)]
    if not len(cn):
        return pd.DataFrame(
            {"u": pd.Series([], dtype="int64"), "w": pd.Series([], dtype="int64"),
             "cn": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    du = cn["x"].map(deg).astype("int64")
    dw = cn["y"].map(deg).astype("int64")
    cnv = cn["cn"].astype("int64")
    out = pd.DataFrame(
        {
            "u": cn["x"].astype("int64"),
            "w": cn["y"].astype("int64"),
            "cn": cnv,
            "jaccard": [
                round(c / (a + b - c), 6)
                for c, a, b in zip(cnv, du, dw)
            ],
        }
    )
    return (
        out.sort_values(
            ["jaccard", "cn", "u", "w"], ascending=[False, False, True, True]
        )
        .head(LINKPRED_TOPK)
        .reset_index(drop=True)
    )


LINK_PREDICTION_SQL = f"""
WITH bip AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
pairs AS (
  SELECT a.s AS x, b.s AS y, COUNT(*) AS c
  FROM bip a JOIN bip b ON a.p = b.p AND a.s < b.s
  GROUP BY a.s, b.s
),
med AS (SELECT quantile_cont(c, 0.75) AS m FROM pairs),
e AS (SELECT x AS u, y AS v FROM pairs, med WHERE c >= m),
sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
deg AS (SELECT u AS n, COUNT(*)::BIGINT AS d FROM sym GROUP BY u),
wedge AS (
  SELECT s1.v AS x, s2.v AS y
  FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
),
cn AS (SELECT x, y, COUNT(*)::BIGINT AS cn FROM wedge GROUP BY x, y),
cand AS (
  SELECT cn.* FROM cn LEFT JOIN e ON e.u = cn.x AND e.v = cn.y
  WHERE e.u IS NULL
)
SELECT c.x AS u, c.y AS w, c.cn,
       ROUND(c.cn::DOUBLE / (d1.d + d2.d - c.cn), 6) AS jaccard
FROM cand c JOIN deg d1 ON d1.n = c.x JOIN deg d2 ON d2.n = c.y
ORDER BY jaccard DESC, cn DESC, u, w LIMIT {LINKPRED_TOPK}
"""


# ------------------------------------------------------------------ OPIC
# On-line Page Importance Computation (Abiteboul, Preda & Cobena,
# WWW 2003) — the classic CRAWL-ORDERING importance measure: each page
# holds "cash"; visiting a page banks its cash into its history and
# distributes it equally to its out-links; importance after k rounds is
# (history + cash) / (total banked + 1). Unlike PageRank it needs no
# damping and converges *online*, which is why production frontiers
# (e.g. the original Xyleme crawler) use it to pick what to fetch next.
# Here: the batch-synchronous variant — round t banks C_{t-1} and pushes
# C_t[dst] = Σ_{src→dst} C_{t-1}[src]/deg[src] — so importance is the
# average of the first k+1 cash iterates, oracle-checkable by the same
# unrolled-CTE + per-iteration-rounding contract as pagerank above.
#
# Scale shape: identical to pagerank's rank-push — the edge index pays
# its shuffle once at build; per round each src bucket point-reads ITS
# edge partition and emits per-dst-bucket partial cash sums pre-routed
# into plasma slices (num_returns=_B+1; the +1 slice carries the
# bucket's own banked-history accumulator forward, so history never
# crosses buckets and never touches the driver).
#
# Reference analogy: scheduler.go:209-243 orders the frontier by
# depth/priority; OPIC is the authority-based priority a web-scale
# deployment would feed that same queue (SURVEY.md §2.5 T7).

OPIC_ITERS = 3


@_ray.remote(num_cpus=1)
def _opic_init(edge_dir: str, bucket: int, init: float):
    e = _read_bucket_edges(edge_dir, bucket)
    nodes = e["src"].unique()
    acc = pd.Series(init, index=np.sort(nodes))
    import pyarrow as pa

    acc_t = pa.table({"node": acc.index.to_numpy(np.int64),
                      "acc": acc.to_numpy(np.float64)})
    return (*_push_slices(e, init), acc_t)


@_ray.remote(num_cpus=1)
def _opic_round(edge_dir: str, bucket: int, acc_t, *slices):
    cash = _merge_rank(slices, 0.0, 1.0)  # round(Σ partials), no damping
    acc = acc_t.to_pandas().set_index("node")["acc"].add(cash, fill_value=0.0)
    import pyarrow as pa

    acc_out = pa.table({"node": acc.index.to_numpy(np.int64),
                        "acc": acc.to_numpy(np.float64)})
    e = _read_bucket_edges(edge_dir, bucket)
    return (*_push_slices(e, cash), acc_out)


@_ray.remote(num_cpus=1)
def _opic_final(acc_t, k: int, *slices):
    cash = _merge_rank(slices, 0.0, 1.0)
    acc = acc_t.to_pandas().set_index("node")["acc"].add(cash, fill_value=0.0)
    import pyarrow as pa

    imp = r2(acc.to_numpy(np.float64) / (k + 1), RANK_DECIMALS)
    return pa.table({"node": acc.index.to_numpy(np.int64), "importance": imp})


def opic_importance(sf_dir: str, iters: int = OPIC_ITERS) -> pd.DataFrame:
    """(node, importance) — batch-OPIC over the symmetrized link graph;
    importance = ROUND(mean of the k+1 per-round cash vectors, 12)."""
    import pyarrow as pa
    import ray

    edge_dir = build_edge_index(sf_dir)
    buckets = [b for b in range(_B) if _bucket_edge_files(edge_dir, b)]

    n = sum(ray.get([_pr_node_count.remote(edge_dir, b) for b in buckets]))
    init = float(r2(1.0 / n, RANK_DECIMALS))

    opts = {"num_returns": _B + 1}
    # outs[i] = (slice_0..slice_{B-1}, acc_ref) for bucket buckets[i]
    outs = [_opic_init.options(**opts).remote(edge_dir, b, init) for b in buckets]
    for _ in range(iters - 1):
        outs = [
            _opic_round.options(**opts).remote(
                edge_dir, b, outs[i][_B], *[o[b] for o in outs]
            )
            for i, b in enumerate(buckets)
        ]
    finals = [
        _opic_final.remote(outs[i][_B], iters, *[o[b] for o in outs])
        for i, b in enumerate(buckets)
    ]
    out = pa.concat_tables(ray.get(finals)).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def opic_sql(iters: int = OPIC_ITERS) -> str:
    """Unrolled-CTE DuckDB mirror: same init, per-round rounding, and the
    same left-to-right accumulation order for the final average."""
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
c0 AS (SELECT src AS node, ROUND(1.0 / (SELECT n FROM nn), {nd}) AS cash FROM deg)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT e.dst AS node, ROUND(SUM(c.cash / dg.deg), {nd}) AS cash
  FROM edges e
  JOIN c{i - 1} c ON c.node = e.src
  JOIN deg dg ON dg.src = e.src
  GROUP BY e.dst
)"""
        )
    acc = " + ".join(f"c{i}.cash" for i in range(iters + 1))
    joins = " ".join(f"JOIN c{i} USING (node)" for i in range(1, iters + 1))
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, ROUND(({acc}) / {iters + 1}, {nd}) AS importance"
        + f"\nFROM c0 {joins} ORDER BY node"
    )


OPIC_SQL = opic_sql()


# ----------------------------------------------------- label propagation
# Community detection by synchronous label propagation (Raghavan et al.
# 2007) over the same symmetrized part↔supplier graph — the "collapse
# near-identical host communities" primitive of a crawl frontier (the
# mirror_collapse cousin that needs no pairwise similarity, only edges).
# Deterministic contract: every node starts labeled with its own id; each
# round every node adopts the most frequent label among its NEIGHBORS,
# ties broken by the smallest label; a fixed LPA_ITERS synchronous rounds
# (integer counts — exactly reproducible, so the oracle is an unrolled
# AS MATERIALIZED CTE chain). Scale shape identical to pagerank: the edge
# list pays its shuffle once at index-build; per round, src-bucket tasks
# emit per-(dst, label) COUNT partials pre-routed into one plasma slice
# per dst bucket (num_returns=_B), dst-bucket tasks vote and push — zero
# driver transit, no per-round edge exchange.
LPA_ITERS = 3


def _lpa_route(dst: np.ndarray, lab: np.ndarray) -> tuple:
    import pyarrow as pa

    part = (
        pd.DataFrame({"dst": dst, "label": lab})
        .groupby(["dst", "label"], sort=False)
        .size()
        .reset_index(name="c")
    )
    part["b"] = part["dst"].to_numpy() & (_B - 1)
    by_b = dict(tuple(part.groupby("b", sort=False)))
    out = []
    for b in range(_B):
        sub = by_b.get(b)
        if sub is None:
            out.append(
                pa.table(
                    {"dst": pa.array([], pa.int64()),
                     "label": pa.array([], pa.int64()),
                     "c": pa.array([], pa.int64())}
                )
            )
        else:
            out.append(
                pa.table(
                    {"dst": sub["dst"].to_numpy(np.int64),
                     "label": sub["label"].to_numpy(np.int64),
                     "c": sub["c"].to_numpy(np.int64)}
                )
            )
    return tuple(out)


def _lpa_vote(slices) -> pd.Series:
    """Winning label per dst from its addressed count partials: highest
    summed count, ties -> smallest label (the oracle's ROW_NUMBER order)."""
    import pyarrow as pa

    df = pa.concat_tables(slices).to_pandas()
    g = df.groupby(["dst", "label"], sort=False)["c"].sum().reset_index()
    g = g.sort_values(
        ["dst", "c", "label"], ascending=[True, False, True], kind="mergesort"
    ).drop_duplicates("dst", keep="first")
    return pd.Series(
        g["label"].to_numpy(np.int64), index=g["dst"].to_numpy(np.int64)
    )


@_ray.remote(num_cpus=1)
def _lpa_push_init(edge_dir: str, bucket: int):
    e = _read_bucket_edges(edge_dir, bucket)
    return _lpa_route(e["dst"].to_numpy(np.int64), e["src"].to_numpy(np.int64))


@_ray.remote(num_cpus=1)
def _lpa_vote_push(edge_dir: str, bucket: int, *slices):
    labels = _lpa_vote(slices)
    e = _read_bucket_edges(edge_dir, bucket)
    return _lpa_route(
        e["dst"].to_numpy(np.int64), e["src"].map(labels).to_numpy(np.int64)
    )


@_ray.remote(num_cpus=1)
def _lpa_final(*slices):
    import pyarrow as pa

    labels = _lpa_vote(slices)
    return pa.table(
        {
            "node": pa.array(labels.index.to_numpy(np.int64)),
            "label": pa.array(labels.to_numpy(np.int64)),
        }
    )


def label_propagation(sf_dir: str, iters: int = LPA_ITERS) -> pd.DataFrame:
    """(node, label) after ``iters`` synchronous LPA rounds."""
    import ray

    edge_dir = build_edge_index(sf_dir)
    buckets = [b for b in range(_B) if _bucket_edge_files(edge_dir, b)]
    opts = {"num_returns": _B}
    slices = [
        _lpa_push_init.options(**opts).remote(edge_dir, b) for b in buckets
    ]
    for _ in range(iters - 1):
        slices = [
            _lpa_vote_push.options(**opts).remote(
                edge_dir, b, *[s[b] for s in slices]
            )
            for b in buckets
        ]
    finals = [_lpa_final.remote(*[s[b] for s in slices]) for b in buckets]
    import pyarrow as pa

    out = pa.concat_tables(ray.get(finals)).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def label_propagation_sql(iters: int = LPA_ITERS) -> str:
    """Unrolled AS MATERIALIZED CTE chain — same init, vote and tie-break
    each round (materialization per round, or DuckDB re-inlines the chain
    exponentially; see the kmeans/BPE oracle contract)."""
    ctes = [
        f"""e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
edges AS (
  SELECT p AS src, s + {SUPPLIER_OFFSET} AS dst FROM e0
  UNION ALL
  SELECT s + {SUPPLIER_OFFSET} AS src, p AS dst FROM e0
),
l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM edges)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""l{i} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT e.dst AS node, l.label, COUNT(*) AS c,
           ROW_NUMBER() OVER (
             PARTITION BY e.dst ORDER BY COUNT(*) DESC, l.label
           ) AS rn
    FROM edges e JOIN l{i - 1} l ON l.node = e.src
    GROUP BY e.dst, l.label
  ) WHERE rn = 1
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, label::BIGINT AS label FROM l{iters} ORDER BY node"
    )


LABEL_PROPAGATION_SQL = label_propagation_sql()


# ------------------------------------------------------- personalized pagerank
# PPR (Page et al. 1999 §6; Haveliwala's topic-sensitive variant): the
# teleport mass lands on a SEED SET instead of uniformly — the canonical
# seed-biased crawl-importance measure (schedule fetches by proximity to
# trusted hubs; TrustRank is exactly this with a spam-free seed basket).
# Same once-shuffled bucket edge index, pre-routed plasma push and
# per-iteration 12-dp rounding contract as pagerank; only the base term
# changes from (1-d)/N to (1-d)/|S| · 1[v ∈ S], so the unrolled-CTE
# oracle mirrors the full iteration as before.

PPR_SEED_MAX = 10  # seeds = part-side nodes with key <= 10


def _ppr_base(index: "np.ndarray", seeds: tuple, base: float) -> "np.ndarray":
    return np.where(np.isin(index, np.asarray(seeds, dtype=np.int64)), base, 0.0)


def _merge_rank_ppr(slices, seeds: tuple, base: float, d: float) -> pd.Series:
    import pyarrow as pa

    df = pa.concat_tables(slices).to_pandas()
    s = df.groupby("dst", sort=False)["c"].sum()
    idx = s.index.to_numpy(np.int64)
    return pd.Series(
        r2(_ppr_base(idx, seeds, base) + d * s.to_numpy(), RANK_DECIMALS), index=idx
    )


@_ray.remote(num_cpus=1)
def _ppr_seed_nodes(edge_dir: str, bucket: int) -> list:
    e = _read_bucket_edges(edge_dir, bucket)
    u = e["src"].unique()
    return sorted(int(x) for x in u[u <= PPR_SEED_MAX])


@_ray.remote(num_cpus=1)
def _ppr_push_init(edge_dir: str, bucket: int, seeds: tuple, init: float):
    e = _read_bucket_edges(edge_dir, bucket)
    srcs = e["src"].unique()
    rank = pd.Series(
        np.where(np.isin(srcs, np.asarray(seeds, dtype=np.int64)), init, 0.0),
        index=srcs.astype(np.int64),
    )
    return _push_slices(e, rank)


@_ray.remote(num_cpus=1)
def _ppr_merge_push(edge_dir: str, bucket: int, seeds: tuple, base: float,
                    d: float, *slices):
    rank = _merge_rank_ppr(slices, seeds, base, d)
    return _push_slices(_read_bucket_edges(edge_dir, bucket), rank)


@_ray.remote(num_cpus=1)
def _ppr_merge_final(seeds: tuple, base: float, d: float, *slices):
    import pyarrow as pa

    rank = _merge_rank_ppr(slices, seeds, base, d)
    return pa.table(
        {"node": rank.index.to_numpy(np.int64), "rank": rank.to_numpy(np.float64)}
    )


def personalized_pagerank(
    sf_dir: str, iters: int = PAGERANK_ITERS, d: float = PAGERANK_D
) -> pd.DataFrame:
    """(node, rank) after ``iters`` seed-teleport rank-push rounds."""
    import ray

    edge_dir = build_edge_index(sf_dir)
    buckets = [b for b in range(_B) if _bucket_edge_files(edge_dir, b)]

    seeds = tuple(
        sorted(
            x
            for part in ray.get([_ppr_seed_nodes.remote(edge_dir, b) for b in buckets])
            for x in part
        )
    )
    ns = len(seeds)
    base = (1.0 - d) / ns
    init = float(r2(1.0 / ns, RANK_DECIMALS))

    opts = {"num_returns": _B}
    slices = [
        _ppr_push_init.options(**opts).remote(edge_dir, b, seeds, init)
        for b in buckets
    ]
    for _ in range(iters - 1):
        slices = [
            _ppr_merge_push.options(**opts).remote(
                edge_dir, b, seeds, base, d, *[s[b] for s in slices]
            )
            for b in buckets
        ]
    finals = [
        _ppr_merge_final.remote(seeds, base, d, *[s[b] for s in slices])
        for b in buckets
    ]
    import pyarrow as pa

    out = pa.concat_tables(ray.get(finals)).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def personalized_pagerank_sql(
    iters: int = PAGERANK_ITERS, d: float = PAGERANK_D
) -> str:
    nd = RANK_DECIMALS
    ctes = [
        f"""e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
edges AS (
  SELECT p AS src, s + {SUPPLIER_OFFSET} AS dst FROM e0
  UNION ALL
  SELECT s + {SUPPLIER_OFFSET} AS src, p AS dst FROM e0
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
ns AS (SELECT COUNT(*)::DOUBLE AS n FROM deg WHERE src <= {PPR_SEED_MAX}),
r0 AS (
  SELECT src AS node,
         CASE WHEN src <= {PPR_SEED_MAX}
              THEN ROUND(1.0 / (SELECT n FROM ns), {nd}) ELSE 0.0 END AS rank
  FROM deg
)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT e.dst AS node,
         ROUND(CASE WHEN e.dst <= {PPR_SEED_MAX}
                    THEN (1.0 - {d}) / (SELECT n FROM ns) ELSE 0.0 END
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


PERSONALIZED_PAGERANK_SQL = personalized_pagerank_sql()
