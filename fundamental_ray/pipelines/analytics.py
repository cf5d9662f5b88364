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
from fundamental_ray.sources.parquet import read_parquet_clean

import pandas as pd
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def r2(x, nd: int = 2):
    """Half-away-from-zero rounding — matches DuckDB/SQL ROUND (numpy/python
    round are half-to-even, which diverges on exact .5 ties)."""
    import numpy as np

    m = 10**nd
    return np.sign(x) * np.floor(np.abs(np.asarray(x, dtype=np.float64)) * m + 0.5) / m


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
                "average_price": float(r2(weighted)),
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
    out["average_price"] = r2(out["average_price"])
    out["avg_price_per_sqm"] = r2(out["avg_price_per_sqm"])
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
                    "median_price": float(r2(np.median(g["o_totalprice"].to_numpy()))),
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
    orders = read_parquet_clean(
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
    out["avg_acctbal"] = r2(out["avg_acctbal"])
    return out


BROADCAST_JOIN_ENRICH_SQL = """
SELECT r_name, n_name, COUNT(*)::BIGINT AS n_customers,
       ROUND(AVG(c_acctbal), 2) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
def monthly_timeseries(sf_dir: str) -> pd.DataFrame:
    """A8 (PropertyCharts.tsx:183-233): month-bucketed counts/means/medians
    over a derived YYYY-MM column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def proj(t: pa.Table) -> pa.Table:
        month = pc.strftime(t["o_orderdate"], format="%Y-%m")
        return pa.table({"month": month, "o_totalprice": t["o_totalprice"]})

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = g["o_totalprice"].to_numpy()
        return pd.DataFrame(
            [
                {
                    "month": g["month"].iloc[0],
                    "n": len(v),
                    "avg_price": float(r2(v.mean())),
                    "median_price": float(r2(np.median(v))),
                }
            ]
        )

    return (
        ds.map_batches(proj, batch_format="pyarrow")
        .groupby("month")
        .map_groups(agg, batch_format="pandas")
        .to_pandas()
    )


MONTHLY_TIMESERIES_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*)::BIGINT AS n,
       ROUND(AVG(o_totalprice), 2) AS avg_price,
       ROUND(median(o_totalprice), 2) AS median_price
FROM orders GROUP BY 1
"""


# --------------------------------------------------------------------------
def rooms_impact(sf_dir: str) -> pd.DataFrame:
    """A10 (PropertyCharts.tsx:244-263): small-cardinality group stats plus a
    lag-difference 'premium' between consecutive groups — group aggregate in
    Ray, lag fold on the (tiny) sorted result."""
    import numpy as np

    ds = _read(sf_dir, "lineitem", ["l_linenumber", "l_extendedprice"])

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        v = g["l_extendedprice"].to_numpy()
        return pd.DataFrame(
            [
                {
                    "l_linenumber": int(g["l_linenumber"].iloc[0]),
                    "n": len(v),
                    "avg_price": float(v.mean()),
                    "median_price": float(np.median(v)),
                }
            ]
        )

    pdf = (
        ds.groupby("l_linenumber")
        .map_groups(agg, batch_format="pandas")
        .to_pandas()
        .sort_values("l_linenumber")
        .reset_index(drop=True)
    )
    prev = pdf["avg_price"].shift(1)
    pdf["premium_pct"] = r2((pdf["avg_price"] - prev) / prev * 100)
    pdf["avg_price"] = r2(pdf["avg_price"])
    pdf["median_price"] = r2(pdf["median_price"])
    return pdf


ROOMS_IMPACT_SQL = """
WITH g AS (
  SELECT l_linenumber, COUNT(*)::BIGINT AS n, AVG(l_extendedprice) AS avg_price,
         median(l_extendedprice) AS median_price
  FROM lineitem GROUP BY 1
)
SELECT l_linenumber, n, ROUND(avg_price, 2) AS avg_price,
       ROUND(median_price, 2) AS median_price,
       ROUND((avg_price - LAG(avg_price) OVER (ORDER BY l_linenumber))
             / LAG(avg_price) OVER (ORDER BY l_linenumber) * 100, 2) AS premium_pct
FROM g ORDER BY l_linenumber
"""


# --------------------------------------------------------------------------
def ols_regression(sf_dir: str) -> pd.DataFrame:
    """A11 (PropertyCharts.tsx:266-284): OLS slope/intercept via per-batch
    partial sums (Σx, Σy, Σxx, Σxy, n) + driver combine — no shuffle at all."""
    import numpy as np
    import pyarrow as pa

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        x = t["l_quantity"].to_numpy().astype(np.float64)
        y = t["l_extendedprice"].to_numpy().astype(np.float64)
        return pd.DataFrame(
            [{"n": len(x), "sx": x.sum(), "sy": y.sum(),
              "sxx": (x * x).sum(), "sxy": (x * y).sum()}]
        )

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n, sx, sy, sxx, sxy = p["n"], p["sx"], p["sy"], p["sxx"], p["sxy"]
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame(
        [{"slope": float(r2(slope, 4)), "intercept": float(r2(intercept)),
          "n": int(n)}]
    )


OLS_REGRESSION_SQL = """
SELECT ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
       COUNT(*)::BIGINT AS n
FROM lineitem
"""


# --------------------------------------------------------------------------
def minmax_profile(sf_dir: str) -> pd.DataFrame:
    """A13 (PropertyCharts.tsx:64-84): range profiling to initialize filters."""
    ds = _read(sf_dir, "orders", ["o_totalprice", "o_orderdate"])
    row = ds.aggregate(
        Min("o_totalprice", alias_name="min_price"),
        Max("o_totalprice", alias_name="max_price"),
        Min("o_orderdate", alias_name="min_date"),
        Max("o_orderdate", alias_name="max_date"),
    )
    return pd.DataFrame([row])


MINMAX_PROFILE_SQL = """
SELECT MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
       MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
FROM orders
"""


# --------------------------------------------------------------------------
def distinct_pairs(sf_dir: str) -> pd.DataFrame:
    """A6 (district.go:61-90): SELECT DISTINCT two columns — groupby-first."""
    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_nationkey"])
    out = (
        ds.groupby(["c_mktsegment", "c_nationkey"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
    )
    return out[["c_mktsegment", "c_nationkey"]]


DISTINCT_PAIRS_SQL = """
SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
"""


# --------------------------------------------------------------------------
def window_prev_order(sf_dir: str) -> pd.DataFrame:
    """J7 (database.go:1420-1438): per-key previous observation (lag) —
    bucketized vectorized fold: keys hash into a bounded number of buckets
    and each bucket task lags ALL its keys with one sort + groupby-shift
    (a map_groups per custkey would pay a pandas round-trip per tiny
    group — millions of python frames at scale)."""
    import pyarrow as pa

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["o_custkey"], 255), pa.int32())
        )

    def lag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
        ).reset_index(drop=True)
        g["prev_totalprice"] = g.groupby("o_custkey", sort=False)["o_totalprice"].shift(1)
        return g[["o_custkey", "o_orderkey", "prev_totalprice"]]

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lag_bucket, batch_format="pandas")
        .to_pandas()
    )


WINDOW_PREV_ORDER_SQL = """
SELECT o_custkey, o_orderkey,
       LAG(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS prev_totalprice
FROM orders
"""


# --------------------------------------------------------------------------
def latest_wins_merge(sf_dir: str) -> pd.DataFrame:
    """D3/S6 (database.go:766-915): latest-wins per key — the property-store
    compaction shape expressed over orders (latest order per customer)."""
    import pyarrow as pa

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["o_custkey"], 255), pa.int32())
        )

    def latest_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"],
            ascending=[True, False, False],
            kind="mergesort",
        )
        return g.loc[~g["o_custkey"].duplicated(keep="first"),
                     ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]]

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(latest_bucket, batch_format="pandas")
        .to_pandas()
    )


LATEST_WINS_MERGE_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
  ) AS rn FROM orders
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
SESSION_GAP_MIN = 30


def events_sessionize(sf_dir: str) -> pd.DataFrame:
    """Streaming-shaped op (SURVEY.md §2.11): gap-based sessionization of the
    events log — partition by key, sort by ts within the group, stateful fold
    in pandas (Ray Data has no event-time windows; the ordering assumption is
    per-user ts order, deterministic tiebreak event_id)."""
    import pyarrow as pa

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    # bucket users so each task sessionizes MANY users vectorized — a
    # per-user map_groups would pay a python/pandas round-trip per tiny
    # group (10k+ groups) and anti-scales at high core counts
    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], 255), pa.int32())
        )

    def sess_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
        g["session_no"] = (
            (new_user | gap).groupby(g["user_id"].to_numpy()).cumsum().astype("int64")
        )
        out = (
            g.groupby(["user_id", "session_no"], sort=False)
            .agg(
                n_events=("event_id", "size"),
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                total_value=("value", "sum"),
            )
            .reset_index()
        )
        out["total_value"] = r2(out["total_value"])
        return out

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sess_bucket, batch_format="pandas")
        .to_pandas()
    )


EVENTS_SESSIONIZE_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, event_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM e
)
SELECT user_id, session_no::BIGINT AS session_no, COUNT(*)::BIGINT AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       ROUND(SUM(value), 2) AS total_value
FROM s GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
def events_tumbling_window(sf_dir: str) -> pd.DataFrame:
    """Tumbling event-time window: per (user, hour) aggregate via a derived
    bucket column + groupby — the §2.11 micro-batch analogue."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def proj(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table({"user_id": t["user_id"], "hour": hour, "value": t["value"]})

    out = (
        ds.map_batches(proj, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="total_value"))
        .to_pandas()
    )
    out["total_value"] = r2(out["total_value"])
    return out


EVENTS_TUMBLING_SQL = """
SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*)::BIGINT AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
FUNNEL_WINDOW_HOURS = 6


def events_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered conversion funnel view -> click -> purchase: users counted
    at stage k+1 only for events STRICTLY AFTER their first stage-k event
    and within FUNNEL_WINDOW_HOURS of it (the time bound is what makes the
    funnel discriminate — unbounded, every long-lived user converts).
    One user-hash exchange; each bucket computes its users' first-view /
    first-click-after / first-purchase-after with grouped mins (no per-user
    Python loop), emits a 3-int partial, and the driver sums <= 256
    partials — funnel width never transits an exchange."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"],
        filter=pads.field("event_type").isin(["view", "click", "purchase"]),
    )

    def bucketize(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], 255), pa.int32())
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        w = pd.Timedelta(hours=FUNNEL_WINDOW_HOURS)

        def first_after(stage: str, prev: pd.DataFrame, col: str) -> pd.DataFrame:
            ev = g.loc[g.event_type == stage].merge(prev, on="user_id")
            hit = ev.loc[(ev.ts > ev[col]) & (ev.ts <= ev[col] + w)]
            return hit.groupby("user_id", as_index=False)["ts"].min()

        v = (
            g.loc[g.event_type == "view"]
            .groupby("user_id", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "vt"})
        )
        c = first_after("click", v, "vt").rename(columns={"ts": "ct"})
        p = first_after("purchase", c, "ct")
        return pd.DataFrame(
            [{"n_view": len(v), "n_view_click": len(c), "n_full_funnel": len(p)}]
        )

    parts = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame([parts.sum().astype("int64")]).reset_index(drop=True)


EVENTS_FUNNEL_SQL = f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t
    AND e.ts <= v.t + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t
    AND e.ts <= c.t + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM v)::BIGINT AS n_view,
       (SELECT COUNT(*) FROM c)::BIGINT AS n_view_click,
       (SELECT COUNT(*) FROM p)::BIGINT AS n_full_funnel
"""


# --------------------------------------------------------------------------
PIVOT_TYPES = ["view", "click", "purchase", "signup", "error"]


def events_pivot_dow(sf_dir: str) -> pd.DataFrame:
    """Pivot/crosstab: event counts by (day-of-week x event type). Per-batch
    partial counts (the combiner), ONE tiny groupby-sum exchange of at most
    7 x types x blocks rows, then the 7x5 reshape on the driver — the wide
    axis never crosses a shuffle as rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        # pyarrow day_of_week: 0=Monday; SQL dayofweek: 0=Sunday
        dow = (pc.day_of_week(t["ts"]).to_numpy() + 1) % 7
        df = pd.DataFrame(
            {"dow": dow, "event_type": t["event_type"].to_numpy(zero_copy_only=False)}
        )
        out = df.value_counts(["dow", "event_type"]).rename("n").reset_index()
        out["dow"] = out["dow"].astype("int64")
        return out

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["dow", "event_type"])
        .sum("n")
        .to_pandas()  # <= 7 x types rows
    )
    wide = (
        counts.pivot(index="dow", columns="event_type", values="sum(n)")
        .fillna(0)
        .astype("int64")
    )
    return pd.DataFrame(
        {
            "dow": wide.index.to_numpy(),
            **{f"n_{t}": wide.get(t, 0) for t in PIVOT_TYPES},
        }
    ).reset_index(drop=True)


EVENTS_PIVOT_DOW_SQL = """
SELECT dayofweek(ts) AS dow,
       COUNT(*) FILTER (event_type = 'view')::BIGINT AS n_view,
       COUNT(*) FILTER (event_type = 'click')::BIGINT AS n_click,
       COUNT(*) FILTER (event_type = 'purchase')::BIGINT AS n_purchase,
       COUNT(*) FILTER (event_type = 'signup')::BIGINT AS n_signup,
       COUNT(*) FILTER (event_type = 'error')::BIGINT AS n_error
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
def window_ntile_orders(sf_dir: str) -> pd.DataFrame:
    """NTILE(4) ranking window: quartile of order value within each
    priority class (tie-broken on orderkey for determinism). Distributed
    as a partition-key groupby; each group sorts once and assigns buckets
    by NTILE's size rule (first n%k buckets get the extra row) — a
    per-partition vectorized pass, no global sort. Partition cardinality
    bounds group size; at 100 TB a hot partition would salt on a second
    key and merge ranks by offset (same shape as the district medians)."""

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def ntile(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = g.sort_values(
            ["o_totalprice", "o_orderkey"], kind="mergesort"
        ).reset_index(drop=True)
        n, k = len(g), 4
        sizes = np.full(k, n // k, dtype=np.int64)
        sizes[: n % k] += 1
        bounds = np.cumsum(sizes)
        g["quartile"] = (
            np.searchsorted(bounds, np.arange(n), side="right") + 1
        ).astype("int64")
        return g[["o_orderkey", "o_orderpriority", "quartile"]]

    return (
        ds.groupby("o_orderpriority")
        .map_groups(ntile, batch_format="pandas")
        .to_pandas()
    )


WINDOW_NTILE_SQL = """
SELECT o_orderkey, o_orderpriority,
       NTILE(4) OVER (
         PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
       )::BIGINT AS quartile
FROM orders
"""


def scalar_string_funcs(sf_dir: str) -> pd.DataFrame:
    """§2.10 string family (M16/M18 analogues): lower/replace/substr/length
    as vectorized pyarrow kernels."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_brand"])

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "brand_norm": pc.replace_substring(
                    pc.utf8_lower(t["p_brand"]), pattern="#", replacement="-"
                ),
                "name_prefix": pc.utf8_slice_codeunits(t["p_name"], 0, 4),
                "name_len": pc.utf8_length(t["p_name"]).cast(pa.int64()),
            }
        )

    return ds.map_batches(proj, batch_format="pyarrow").to_pandas()


SCALAR_STRING_SQL = """
SELECT p_partkey, replace(lower(p_brand), '#', '-') AS brand_norm,
       substr(p_name, 1, 4) AS name_prefix, length(p_name)::BIGINT AS name_len
FROM part
"""


# --------------------------------------------------------------------------
def scalar_date_funcs(sf_dir: str) -> pd.DataFrame:
    """§2.10 date family (M13/julianday analogues): year/month extraction,
    YYYY-MM formatting, day deltas vs a fixed epoch."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    epoch = pd.Timestamp("1995-01-01")

    def proj(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"]
        days = pc.cast(
            pc.divide(pc.cast(pc.subtract(d, pa.scalar(epoch, d.type)), pa.int64()),
                      86_400_000_000),
            pa.int64(),
        )
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "order_year": pc.year(d).cast(pa.int64()),
                "order_month": pc.month(d).cast(pa.int64()),
                "order_ym": pc.strftime(d, format="%Y-%m"),
                "days_since_epoch": days,
            }
        )

    return ds.map_batches(proj, batch_format="pyarrow").to_pandas()


SCALAR_DATE_SQL = """
SELECT o_orderkey, date_part('year', o_orderdate)::BIGINT AS order_year,
       date_part('month', o_orderdate)::BIGINT AS order_month,
       strftime(o_orderdate, '%Y-%m') AS order_ym,
       date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)::BIGINT AS days_since_epoch
FROM orders
"""


# --------------------------------------------------------------------------
def heatmap_stats(sf_dir: str) -> pd.DataFrame:
    """A12 (PriceHeatmap.tsx:197-252): per-district mean/median + density,
    range computed over districts with count >= 3 only."""
    import numpy as np

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        v = g["c_acctbal"].to_numpy()
        return pd.DataFrame(
            [
                {
                    "c_nationkey": int(g["c_nationkey"].iloc[0]),
                    "density": len(v),
                    "avg_val": float(r2(v.mean())),
                    "median_val": float(r2(np.median(v))),
                }
            ]
        )

    pdf = ds.groupby("c_nationkey").map_groups(agg, batch_format="pandas").to_pandas()
    eligible = pdf[pdf["density"] >= 3]
    pdf["range_min"] = float(r2(eligible["avg_val"].min()))
    pdf["range_max"] = float(r2(eligible["avg_val"].max()))
    return pdf


HEATMAP_STATS_SQL = """
WITH g AS (
  SELECT c_nationkey, COUNT(*)::BIGINT AS density,
         ROUND(AVG(c_acctbal), 2) AS avg_val,
         ROUND(median(c_acctbal), 2) AS median_val
  FROM customer GROUP BY 1
)
SELECT c_nationkey, density, avg_val, median_val,
       (SELECT ROUND(MIN(avg_val), 2) FROM g WHERE density >= 3) AS range_min,
       (SELECT ROUND(MAX(avg_val), 2) FROM g WHERE density >= 3) AS range_max
FROM g
"""
