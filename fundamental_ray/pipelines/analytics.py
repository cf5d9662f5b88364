"""Analytics operators (SURVEY.md §2.7-§2.8) re-expressed over the testdata
tables so the driver's DuckDB oracle can check them at sf=0.01.

Each function mirrors one reference aggregate/sort/join shape (cited), takes
``sf_dir`` and returns a small pandas DataFrame / Dataset. Convention: every
float aggregate is rounded to 2 decimals on BOTH sides (Ray + oracle SQL) so
order-insensitive value-hashing is robust to float summation order.

All heavy work stays in Ray Data (groupby/aggregate/sort/map_groups);
only final, already-aggregated frames are collected on the driver.
"""

from __future__ import annotations

import pandas as pd
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# --------------------------------------------------------------------------
def weighted_status_stats(sf_dir: str) -> pd.DataFrame:
    """A1 (database.go:202-287): per-status partial aggregates then a
    count-weighted final combine — partial+final over a groupby, with the
    tiny combine on the driver. Statuses 'O'/'F' stand in for active/sold."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
    pdf = (
        ds.groupby("o_orderstatus")
        .aggregate(Count(alias_name="n"), Mean("o_totalprice", alias_name="avg_price"))
        .to_pandas()
    )
    by = {r["o_orderstatus"]: r for _, r in pdf.iterrows()}
    n_o = int(by["O"]["n"]) if "O" in by else 0
    n_f = int(by["F"]["n"]) if "F" in by else 0
    avg_o = float(by["O"]["avg_price"]) if n_o else 0.0
    avg_f = float(by["F"]["avg_price"]) if n_f else 0.0
    total = n_o + n_f
    weighted = ((avg_o * n_o) + (avg_f * n_f)) / total if total else 0.0
    return pd.DataFrame(
        [
            {
                "total_properties": total,
                "average_price": round(weighted, 2),
                "total_active": n_o,
                "total_sold": n_f,
            }
        ]
    )


WEIGHTED_STATUS_STATS_SQL = """
WITH active_stats AS (
  SELECT COUNT(*) n, COALESCE(AVG(o_totalprice), 0) avg_price
  FROM orders WHERE o_orderstatus = 'O'
), sold_stats AS (
  SELECT COUNT(*) n, COALESCE(AVG(o_totalprice), 0) avg_price
  FROM orders WHERE o_orderstatus = 'F'
)
SELECT
  (a.n + s.n)::BIGINT AS total_properties,
  ROUND(((a.avg_price * a.n) + (s.avg_price * s.n)) / NULLIF(a.n + s.n, 0), 2)
    AS average_price,
  a.n::BIGINT AS total_active,
  s.n::BIGINT AS total_sold
FROM active_stats a, sold_stats s
"""


# --------------------------------------------------------------------------
def district_stats(sf_dir: str) -> pd.DataFrame:
    """A2 (database.go:289-334): count/avg/ratio-avg grouped by a 4-char
    prefix projection (M18 substr district key); NULLIF(size,0) preserved."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read(sf_dir, "part", ["p_type", "p_size", "p_retailprice"])

    def proj(t: pa.Table) -> pa.Table:
        district = pc.utf8_slice_codeunits(t["p_type"], 0, 4)
        size = t["p_size"].cast(pa.float64())
        size = pc.if_else(pc.equal(size, 0.0), pa.scalar(None, pa.float64()), size)
        ratio = pc.divide(t["p_retailprice"], size)
        return pa.table(
            {"district": district, "p_retailprice": t["p_retailprice"], "ratio": ratio}
        )

    out = (
        ds.map_batches(proj, batch_format="pyarrow")
        .groupby("district")
        .aggregate(
            Count(alias_name="property_count"),
            Mean("p_retailprice", alias_name="average_price"),
            Mean("ratio", alias_name="avg_price_per_sqm"),
        )
        .to_pandas()
    )
    out["average_price"] = out["average_price"].round(2)
    out["avg_price_per_sqm"] = out["avg_price_per_sqm"].round(2)
    return out


DISTRICT_STATS_SQL = """
SELECT substr(p_type, 1, 4) AS district,
       COUNT(*)::BIGINT AS property_count,
       ROUND(AVG(p_retailprice), 2) AS average_price,
       ROUND(AVG(p_retailprice / NULLIF(p_size, 0)), 2) AS avg_price_per_sqm
FROM part
GROUP BY 1
"""


# --------------------------------------------------------------------------
def exact_median(sf_dir: str) -> pd.DataFrame:
    """A3 (database.go:1216-1249): exact 1-or-2-middle median per group via
    per-group materialization (map_groups) — districts are small groups, the
    guarded pattern of SURVEY.md §7.5.5."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        return pd.DataFrame(
            [
                {
                    "o_orderpriority": g["o_orderpriority"].iloc[0],
                    "median_price": round(float(np.median(g["o_totalprice"].to_numpy())), 2),
                    "n": len(g),
                }
            ]
        )

    return ds.groupby("o_orderpriority").map_groups(med, batch_format="pandas").to_pandas()


EXACT_MEDIAN_SQL = """
SELECT o_orderpriority,
       ROUND(median(o_totalprice), 2) AS median_price,
       COUNT(*)::BIGINT AS n
FROM orders GROUP BY 1
"""


# --------------------------------------------------------------------------
def recent_topk(sf_dir: str) -> pd.DataFrame:
    """K1 (database.go:336-381): ORDER BY date DESC LIMIT k, deterministic
    tie-break on the key column."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    return (
        ds.sort(["o_orderdate", "o_orderkey"], descending=[True, True])
        .limit(10)
        .to_pandas()
    )


RECENT_TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 10
"""


# --------------------------------------------------------------------------
ANTI_JOIN_CUTOFF = "2000-01-01"


def anti_join_customers(sf_dir: str) -> pd.DataFrame:
    """J1/J4 anti-join shape (funda_spider.py:118-120 candidate∖seen,
    database.go:1252-1323 mark-inactive): keys-with-no-recent-match. The
    small side (distinct recent custkeys) is broadcast via ray.put and probed
    per Arrow batch — the §2.6 broadcast-anti pattern; at 10^10-key scale the
    same stage swaps in the sharded seen-set actor pool (crawl/seen.py)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray

    cutoff = pa.scalar(pd.Timestamp(ANTI_JOIN_CUTOFF), pa.timestamp("us"))
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pads.field("o_orderdate") >= cutoff,
    )
    keys = orders.unique("o_custkey")
    key_ref = ray.put(np.asarray(sorted(keys), dtype=np.int64))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def probe(t: pa.Table) -> pa.Table:
        arr = ray.get(key_ref)
        ck = t["c_custkey"].to_numpy()
        idx = np.clip(np.searchsorted(arr, ck), 0, max(0, len(arr) - 1))
        hit = arr[idx] == ck if len(arr) else np.zeros(len(ck), dtype=bool)
        return t.filter(pa.array(~hit))

    return (
        cust.map_batches(probe, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_without_recent_orders"))
        .to_pandas()
    )


ANTI_JOIN_CUSTOMERS_SQL = f"""
SELECT c_mktsegment, COUNT(*)::BIGINT AS n_without_recent_orders
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '{ANTI_JOIN_CUTOFF}'
)
GROUP BY 1
"""


# --------------------------------------------------------------------------
def broadcast_join_enrich(sf_dir: str) -> pd.DataFrame:
    """J5 (database.go:919-928): big fact vs tiny dimensions — dimensions are
    materialized once on the driver, shipped via ray.put, mapped per batch
    (no shuffle join)."""
    import ray

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    dim_ref = ray.put(dim[["n_nationkey", "n_name", "r_name"]])

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def join(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dim_ref)
        return df.merge(d, left_on="c_nationkey", right_on="n_nationkey")[
            ["r_name", "n_name", "c_acctbal"]
        ]

    out = (
        cust.map_batches(join, batch_format="pandas")
        .groupby(["r_name", "n_name"])
        .aggregate(Count(alias_name="n_customers"), Mean("c_acctbal", alias_name="avg_acctbal"))
        .to_pandas()
    )
    out["avg_acctbal"] = out["avg_acctbal"].round(2)
    return out


BROADCAST_JOIN_ENRICH_SQL = """
SELECT r_name, n_name, COUNT(*)::BIGINT AS n_customers,
       ROUND(AVG(c_acctbal), 2) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""
