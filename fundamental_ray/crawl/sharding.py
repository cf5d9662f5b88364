"""Rendezvous (highest-random-weight) host→shard assignment — the
partitioning primitive a multi-node crawler uses to split the frontier.

A 256-node crawl of the 10^10-URL frontier in BASELINE.json must decide,
for every host, WHICH node owns it — ownership has to be (a) computable
anywhere without coordination (any worker that parses a URL can route it),
(b) stable across runs, and (c) minimally disruptive when the shard count
changes (HRW moves only ~1/K of hosts on K→K+1, vs ~all for `hash % K`).
The reference pins one spider process per city/site (funda_spider.py
spider-arg per city), i.e. a hand-made shard map; rendezvous hashing is
the scale-out generalization. Our frontier's politeness and seen-set
stages already group by host — this op computes the host→shard ownership
table those stages would be partitioned by on a real cluster.

Deterministic definition (mirrored exactly by the SQL oracle):
  * host = authority part of the url (text between ``://`` and the first
    ``/``), one row per distinct host;
  * weight(host, s) = first 8 hex chars of ``md5(host || '|' || s)`` as a
    BIGINT, for s in 0..K-1;
  * shard(host) = argmax_s weight (ties — impossible in a 32-bit space at
    this scale but defined anyway — break toward the smaller s).

Scale shape: per-host page counts come from in-batch combiners plus ONE
host-keyed exchange (the only shuffle); the K-way HRW scoring then runs
inside map_batches over the small host table — no cross join ever leaves
a worker, and K is a constant (default 8), so the scoring stage is
O(hosts·K) spread across the pool.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from fundamental_ray.sources.parquet import read_parquet_clean
from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

N_SHARDS = 8


def _hrw_shard(host: str, k: int = N_SHARDS) -> int:
    best_s, best_w = 0, -1
    for s in range(k):
        w = int(hashlib.md5(f"{host}|{s}".encode("utf-8")).hexdigest()[:8], 16)
        if w > best_w:  # strict: ties break toward smaller s
            best_s, best_w = s, w
    return best_s


def _host_pages(sf_dir: str):
    """Dataset of (host, n_pages): in-batch combiner + one exchange."""
    from ray.data.aggregate import Sum

    corpus = materialize_corpus(scale_tag_of(sf_dir))

    def hosts(df: pd.DataFrame):
        import pyarrow as pa

        h = df["url"].str.split("://", n=1).str[1].str.split("/", n=1).str[0]
        out = h.value_counts().rename_axis("host").reset_index(name="np_part")
        # Arrow out: keeps the groupby shuffle's schemas metadata-free
        return pa.table(
            {
                "host": pa.array(out["host"], pa.string()),
                "np_part": pa.array(out["np_part"].to_numpy(dtype="int64")),
            }
        )

    return (
        read_parquet_clean(f"{corpus}/pages.parquet", columns=["url"])
        .map_batches(hosts, batch_format="pandas")
        .groupby("host")
        .aggregate(Sum("np_part", alias_name="n_pages"))
    )


def shard_assignments(sf_dir: str) -> pd.DataFrame:
    """(host, shard, n_pages) — the HRW ownership table for K=8 shards."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "host": df["host"].astype(object),
                "shard": [_hrw_shard(h) for h in df["host"]],
                "n_pages": df["n_pages"].astype("int64"),
            }
        )

    return (
        _host_pages(sf_dir)
        .map_batches(score, batch_format="pandas")
        .to_pandas()
        .astype({"shard": "int64", "n_pages": "int64"})
        .sort_values("host")
        .reset_index(drop=True)
    )


def shard_load(sf_dir: str) -> pd.DataFrame:
    """(shard, n_hosts, n_pages) — the load audit of the HRW map. Every
    shard 0..K-1 appears (zero-filled) so imbalance is visible, not
    silently dropped."""
    a = shard_assignments(sf_dir)
    g = (
        a.groupby("shard", as_index=False)
        .agg(n_hosts=("host", "size"), n_pages=("n_pages", "sum"))
    )
    full = pd.DataFrame({"shard": range(N_SHARDS)}).merge(g, on="shard", how="left")
    return (
        full.fillna(0)
        .astype({"shard": "int64", "n_hosts": "int64", "n_pages": "int64"})
        .sort_values("shard")
        .reset_index(drop=True)
    )


def shard_migration(sf_dir: str) -> pd.DataFrame:
    """(host, shard_k, shard_k1, moved) — what a K→K+1 resize does to the
    ownership table. HRW's defining property (and why `hash % K` is wrong
    for a crawler's frontier): a host either stays put or moves INTO the
    new shard K — the seen-set / politeness state of surviving shards is
    never reshuffled. This query makes that property oracle-checkable."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        k0 = [_hrw_shard(h, N_SHARDS) for h in df["host"]]
        k1 = [_hrw_shard(h, N_SHARDS + 1) for h in df["host"]]
        return pd.DataFrame(
            {
                "host": df["host"].astype(object),
                "shard_k": pd.Series(k0, dtype="int64"),
                "shard_k1": pd.Series(k1, dtype="int64"),
                "moved": [a != b for a, b in zip(k0, k1)],
            }
        )

    return (
        _host_pages(sf_dir)
        .map_batches(score, batch_format="pandas")
        .to_pandas()
        .astype({"shard_k": "int64", "shard_k1": "int64", "moved": "bool"})
        .sort_values("host")
        .reset_index(drop=True)
    )


def _hrw_cte(corpus: str, k: int = N_SHARDS, tag: str = "") -> str:
    return f"""
hosts{tag} AS (
  SELECT split_part(split_part(url, '://', 2), '/', 1) AS host,
         COUNT(*)::BIGINT AS n_pages
  FROM read_parquet('{corpus}/pages.parquet') GROUP BY 1
), scored{tag} AS (
  SELECT host, n_pages, s AS shard,
         ('0x' || substr(md5(host || '|' || s::VARCHAR), 1, 8))::BIGINT AS w
  FROM hosts{tag} CROSS JOIN (SELECT unnest(range({k})) AS s)
), owned{tag} AS (
  SELECT host, shard::BIGINT AS shard, n_pages FROM scored{tag}
  QUALIFY row_number() OVER (PARTITION BY host ORDER BY w DESC, shard) = 1
)"""


def shard_assignments_sql(corpus: str) -> str:
    return f"WITH {_hrw_cte(corpus)} SELECT * FROM owned ORDER BY host"


def shard_migration_sql(corpus: str) -> str:
    return f"""
WITH {_hrw_cte(corpus, N_SHARDS, "_a")},
{_hrw_cte(corpus, N_SHARDS + 1, "_b").lstrip()}
SELECT a.host, a.shard AS shard_k, b.shard AS shard_k1,
       a.shard <> b.shard AS moved
FROM owned_a a JOIN owned_b b USING (host) ORDER BY a.host
"""


def shard_load_sql(corpus: str) -> str:
    return f"""
WITH {_hrw_cte(corpus)}
SELECT s.shard::BIGINT AS shard,
       COALESCE(COUNT(o.host), 0)::BIGINT AS n_hosts,
       COALESCE(SUM(o.n_pages), 0)::BIGINT AS n_pages
FROM (SELECT unnest(range({N_SHARDS})) AS shard) s
LEFT JOIN owned o ON o.shard = s.shard
GROUP BY 1 ORDER BY 1
"""
