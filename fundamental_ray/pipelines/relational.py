"""Relational / windowed extensions beyond the reference's own surface:
rollup aggregates, frame-based moving windows, cohort retention, salted
skew-safe aggregation, and the native hash-shuffle equi-join.

Same conventions as pipelines/analytics.py: every float that crosses the
oracle hash is either integer-exact (cents, counts, week indexes) or
rounded half-away on BOTH sides; heavy work stays in Ray Data and only
final aggregate-sized frames reach the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Count, Max, Sum

from .analytics import _read, r2

# --------------------------------------------------------------------------
# ROLLUP: hierarchical aggregates derived from ONE finest-level groupby.
# Scale shape: the only exchange is the finest groupby (map-side combined);
# the (ALL, *) and (ALL, ALL) levels are aggregates OF those aggregates,
# computed on the driver over a bounded-cardinality table (|returnflag| ×
# |linestatus| ≤ 9 rows) — a second shuffle would move nothing but these.
# Measures are integer-exact (quantities are integral doubles, prices are
# summed as BIGINT cents) so re-aggregation order cannot drift a ulp.


def agg_rollup(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        qty = pc.cast(t["l_quantity"], pa.int64())
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": qty,
                "cents": cents,
            }
        )

    fine = (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("cents", alias_name="sum_price_cents"),
            Count(alias_name="n"),
        )
        .to_pandas()
    )
    levels = [fine.rename(columns={"l_returnflag": "returnflag", "l_linestatus": "linestatus"})]
    mid = (
        fine.groupby("l_returnflag", as_index=False)[["sum_qty", "sum_price_cents", "n"]]
        .sum()
        .rename(columns={"l_returnflag": "returnflag"})
    )
    mid["linestatus"] = "ALL"
    levels.append(mid)
    top = fine[["sum_qty", "sum_price_cents", "n"]].sum().to_frame().T
    top["returnflag"] = "ALL"
    top["linestatus"] = "ALL"
    levels.append(top)
    out = pd.concat(levels, ignore_index=True)[
        ["returnflag", "linestatus", "sum_qty", "sum_price_cents", "n"]
    ]
    for c in ("sum_qty", "sum_price_cents", "n"):
        out[c] = out[c].astype("int64")
    return out


AGG_ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       SUM(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
       SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT))::BIGINT AS sum_price_cents,
       COUNT(*)::BIGINT AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# Frame-based moving window (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW):
# the bucketized per-key fold (window_prev_order's shape) extended to a
# sliding frame. Keys hash into 256 buckets; each bucket task sorts once
# and rolls ALL its keys vectorized. Float stability: the rolling mean is
# computed over integer CENTS (exact under any summation order) and the
# single division + rounding is mirrored in the SQL.


def window_moving_avg(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "cents": cents,
                "bucket": pc.cast(pc.bit_wise_and(t["o_custkey"], 255), pa.int32()),
            }
        )

    def roll_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        grp = g.groupby("o_custkey", sort=False)["cents"]
        s = grp.rolling(3, min_periods=1).sum().to_numpy()
        c = grp.rolling(3, min_periods=1).count().to_numpy()
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "o_custkey": g["o_custkey"].to_numpy(),
                "ma3": r2(s / (c * 100.0), 6),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(roll_bucket, batch_format="pandas")
        .to_pandas()
    )


WINDOW_MOVING_AVG_SQL = """
SELECT o_orderkey, o_custkey,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) OVER w
             / (COUNT(*) OVER w * 100.0), 6) AS ma3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# Cohort retention: users bucketed by first-activity week; each later week
# counts how many of that cohort were active. Scale shape: users hash into
# 256 buckets and each bucket resolves its OWN users' cohorts and distinct
# activity weeks fully locally (a user never spans buckets, so per-bucket
# cell counts sum to exact global distinct-user counts); only the tiny
# (cohort × offset) partials cross the final exchange. No join, no
# distinct over the raw event stream.
# Week arithmetic is pure int64 days-since-epoch (Monday-start, matching
# DuckDB date_trunc('week')): week = (days + 3) // 7.


def events_cohort_retention(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "bucket": pc.cast(pc.bit_wise_and(t["user_id"], 255), pa.int32()),
            }
        )

    def cohort_bucket(g: pd.DataFrame) -> pd.DataFrame:
        days = g["ts"].to_numpy().astype("datetime64[D]").view("int64")
        week = (days + 3) // 7
        df = pd.DataFrame(
            {"user_id": g["user_id"].to_numpy(), "week": week}
        ).drop_duplicates()
        df["cohort"] = df.groupby("user_id")["week"].transform("min")
        out = (
            df.groupby(["cohort", "week"], sort=False).size().rename("n_users").reset_index()
        )
        return out

    parts = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cohort_bucket, batch_format="pandas")
        .groupby(["cohort", "week"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
    )
    monday = (parts["cohort"].to_numpy() * 7 - 3).astype("datetime64[D]")
    out = pd.DataFrame(
        {
            "cohort_week": np.datetime_as_string(monday, unit="D"),
            "week_offset": (parts["week"] - parts["cohort"]).astype("int64"),
            "n_users": parts["n_users"].astype("int64"),
        }
    )
    return out


EVENTS_COHORT_RETENTION_SQL = """
WITH w AS (
  SELECT user_id, date_trunc('week', ts) AS wk FROM events
), c AS (
  SELECT user_id, MIN(wk) AS cohort FROM w GROUP BY user_id
), a AS (
  SELECT DISTINCT w.user_id, c.cohort, w.wk
  FROM w JOIN c USING (user_id)
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
       ((wk::DATE - cohort::DATE) // 7)::BIGINT AS week_offset,
       COUNT(*)::BIGINT AS n_users
FROM a GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Salted two-stage aggregation over a skewed key: event_type has a handful
# of distinct values over the whole stream, so a naive groupby funnels each
# key's entire volume through one reducer. Stage 1 groups by (key, salt)
# — 64 salts fan each hot key across reducers — and emits constant-size
# partials; stage 2 merges the ≤ |keys|×64 partials (driver-side: that
# table is bounded and the merge is the trivial sum/max fold). The stage-2
# sum is rounded, absorbing partial-order float drift.


def agg_skew_salted(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    ds = _read(sf_dir, "events", ["event_type", "event_id", "value"])

    def salt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # integer-cents accumulation (the agg_rollup / join_hash_segments
        # convention): per-salt float partials merged in arbitrary order
        # could drift across a 0.005 rounding boundary vs the oracle's one
        # global SUM — exact int64 cents make the merge order-invariant
        return pa.table(
            {
                "event_type": t["event_type"],
                "value_cents": pc.cast(
                    pc.round(pc.multiply(t["value"], 100.0)), pa.int64()
                ),
                "salt": pc.cast(pc.bit_wise_and(t["event_id"], 63), pa.int32()),
            }
        )

    parts = (
        ds.map_batches(salt, batch_format="pyarrow")
        .groupby(["event_type", "salt"])
        .aggregate(
            Count(alias_name="n"),
            Sum("value_cents", alias_name="sv"),
            Max("value_cents", alias_name="mx"),
        )
        .to_pandas()
    )
    out = (
        parts.groupby("event_type", as_index=False)
        .agg(n=("n", "sum"), total_value=("sv", "sum"), max_value=("mx", "max"))
        .astype({"n": "int64"})
    )
    out["total_value"] = r2(out["total_value"] / 100.0)
    out["max_value"] = r2(out["max_value"] / 100.0)
    return out


AGG_SKEW_SALTED_SQL = """
SELECT event_type, COUNT(*)::BIGINT AS n,
       ROUND(SUM(value), 2) AS total_value,
       ROUND(MAX(value), 2) AS max_value
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Native hash-shuffle equi-join (ray.data.Dataset.join): both sides
# hash-partition on the key and partitions join independently — the
# distributed join primitive the broadcast/anti/as-of variants deliberately
# avoid. Used where BOTH sides are large (orders ⋈ customer); the join
# output never materializes — it flows straight into the revenue groupby.


def join_hash_segments(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def to_cents(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "cents": pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()),
            }
        )

    joined = orders.map_batches(to_cents, batch_format="pyarrow").join(
        cust,
        join_type="inner",
        num_partitions=16,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    out = (
        joined.groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="revenue_cents"))
        .to_pandas()
        .astype({"n_orders": "int64", "revenue_cents": "int64"})
    )
    return out


JOIN_HASH_SEGMENTS_SQL = """
SELECT c_mktsegment, COUNT(*)::BIGINT AS n_orders,
       SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))::BIGINT AS revenue_cents
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# Sliding (hopping) event-time windows: 30-minute windows every 15 minutes,
# so each event lands in exactly 2 windows. Pure map-side FAN-OUT (an
# event row becomes w/step rows with derived window_start keys) followed by
# one groupby — the streaming "hopping window" that tumbling windows can't
# express. Window arithmetic is integer microseconds; no float in the key.

SLIDE_STEP_US = 15 * 60 * 1_000_000
SLIDE_WINDOWS_PER_EVENT = 2  # window size = 2 × step


def events_sliding_window(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    ds = _read(sf_dir, "events", ["ts", "value"])

    def fan_out(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        us = pc.cast(t["ts"], pa.int64())
        slot = pc.floor(pc.divide(pc.cast(us, pa.float64()), SLIDE_STEP_US))
        slot = pc.cast(slot, pa.int64())
        outs = []
        for j in range(SLIDE_WINDOWS_PER_EVENT):
            start = pc.multiply(pc.subtract(slot, j), SLIDE_STEP_US)
            outs.append(
                pa.table(
                    {
                        "window_start": pc.cast(
                            start, pa.timestamp("us")
                        ),
                        "value": t["value"],
                    }
                )
            )
        return pa.concat_tables(outs)

    out = (
        ds.map_batches(fan_out, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="total_value"))
        .to_pandas()
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["total_value"] = r2(out["total_value"])
    return out


EVENTS_SLIDING_WINDOW_SQL = """
WITH e AS (
  SELECT value, time_bucket(INTERVAL 15 MINUTE, ts) AS b FROM events
), w AS (
  SELECT value, b - to_minutes(15 * j) AS window_start
  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS j) t
)
SELECT window_start, COUNT(*)::BIGINT AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM w GROUP BY 1
"""


# --------------------------------------------------------------------------
# Event-type transition matrix (per-user bigram counts): the sequence-model
# data-prep primitive (what page did users go to next?). Same bucketized
# per-key ordered fold as sessionize — one exchange moves event rows, the
# second moves only |types|² × buckets partial counts.


def events_transition_matrix(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], 255), pa.int32())
        )

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same_user = g["user_id"].eq(g["user_id"].shift())
        prev = g["event_type"].shift()
        pairs = pd.DataFrame(
            {"from_type": prev[same_user], "to_type": g["event_type"][same_user]}
        )
        out = (
            pairs.groupby(["from_type", "to_type"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return out

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(transitions, batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out


EVENTS_TRANSITION_MATRIX_SQL = """
WITH s AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev AS from_type, event_type AS to_type, COUNT(*)::BIGINT AS n
FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Distributed set algebra over derived sets: the INTERSECT / EXCEPT of the
# click-user and purchase-user sets, labeled per user. Both operand sets
# are user-scale (too big to broadcast at 100 TB), but membership of a user
# is decidable from that user's OWN rows — so ONE exchange (bucket by user)
# resolves intersect and both differences simultaneously; a literal
# INTERSECT + 2×EXCEPT plan would pay three distinct-shuffles over the same
# stream.


def set_ops_user_membership(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"]))
        t = t.filter(m)
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], 255), pa.int32())
        )

    def membership(g: pd.DataFrame) -> pd.DataFrame:
        has = (
            g.assign(one=True)
            .pivot_table(index="user_id", columns="event_type", values="one", aggfunc="any")
            .reindex(columns=["click", "purchase"], fill_value=False)
            .fillna(False)
        )
        setop = np.where(
            has["click"] & has["purchase"],
            "intersect",
            np.where(has["click"], "click_only", "purchase_only"),
        )
        return pd.DataFrame(
            {"user_id": has.index.to_numpy(np.int64), "setop": setop}
        )

    return (
        ds.map_batches(keep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(membership, batch_format="pandas")
        .to_pandas()
    )


SET_OPS_USER_MEMBERSHIP_SQL = """
WITH m AS (
  SELECT user_id,
         bool_or(event_type = 'click') AS has_click,
         bool_or(event_type = 'purchase') AS has_purchase
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY user_id
)
SELECT user_id,
       CASE WHEN has_click AND has_purchase THEN 'intersect'
            WHEN has_click THEN 'click_only'
            ELSE 'purchase_only' END AS setop
FROM m
"""


# --------------------------------------------------------------------------
# Native FULL OUTER join of two independently-aggregated daily series:
# order revenue by order date vs shipped revenue by ship date. Ship dates
# lag order dates by up to ~4 months, so the calendar genuinely exercises
# all three match cases (order-only head, matched middle, ship-only tail).
# Each side pre-aggregates (map-side shrink to day-cardinality) BEFORE the
# join — the join moves day rows, never raw fact rows.


def join_full_outer_daily(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    def daily(ds, date_col, price_col, cents_name, n_name):
        def proj(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            day = pc.strftime(t[date_col], format="%Y-%m-%d")
            cents = pc.cast(pc.round(pc.multiply(t[price_col], 100.0)), pa.int64())
            return pa.table({"day": day, "cents": cents})

        return (
            ds.map_batches(proj, batch_format="pyarrow")
            .groupby("day")
            .aggregate(Sum("cents", alias_name=cents_name), Count(alias_name=n_name))
        )

    o = daily(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]),
        "o_orderdate", "o_totalprice", "order_cents", "n_orders",
    )
    l = daily(
        _read(sf_dir, "lineitem", ["l_shipdate", "l_extendedprice"]),
        "l_shipdate", "l_extendedprice", "ship_cents", "n_ships",
    )
    joined = o.join(
        l,
        join_type="full_outer",
        num_partitions=8,
        on=("day",),
        left_suffix="_o",
        right_suffix="_l",
    ).to_pandas()
    day_cols = [c for c in joined.columns if c.startswith("day")]
    day = joined[day_cols[0]]
    for c in day_cols[1:]:
        day = day.fillna(joined[c])
    out = pd.DataFrame({"day": day})
    for c in ("order_cents", "n_orders", "ship_cents", "n_ships"):
        out[c] = joined[c].fillna(0).astype("int64")
    return out


JOIN_FULL_OUTER_DAILY_SQL = """
WITH o AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS order_cents,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
), l AS (
  SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,
         SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)) AS ship_cents,
         COUNT(*) AS n_ships
  FROM lineitem GROUP BY 1
)
SELECT COALESCE(o.day, l.day) AS day,
       COALESCE(order_cents, 0)::BIGINT AS order_cents,
       COALESCE(n_orders, 0)::BIGINT AS n_orders,
       COALESCE(ship_cents, 0)::BIGINT AS ship_cents,
       COALESCE(n_ships, 0)::BIGINT AS n_ships
FROM o FULL OUTER JOIN l ON o.day = l.day
"""


# --------------------------------------------------------------------------
# Winsorized aggregate: clip each order's price to its status group's
# [P05, P95] band, then average — the outlier-robust statistic a price
# pipeline reports. Two passes: (1) per-group exact percentiles via the
# GROUPED distributed rank lookup below (the decile op's value-bucketed
# histogram machinery keyed by status — no per-group materialization, so
# a status with 10^9 orders never lands in one task), broadcast the tiny
# band table into (2) a streaming clip+partial-sum pass. Determinism: the
# thresholds are rounded to cents on BOTH sides before clipping (part of
# the op contract — linear interpolation and DuckDB quantile_cont agree
# at 2 dp, not at raw ulps), and the clipped values are exact cents ints,
# so the final mean is order-insensitive up to the one mirrored division.

WINSOR_LO, WINSOR_HI = 0.05, 0.95


def _grouped_order_percentiles(sf_dir: str, qs: list) -> pd.DataFrame:
    """Exact per-status percentiles of o_totalprice — the grouped variant
    of the decile op's histogram rank lookup. (o_orderstatus, q, value)
    rows, values in 2-dp-rounded euros."""
    import ray

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        c = np.round(df["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        out = (
            pd.DataFrame({"g": df["o_orderstatus"].to_numpy(), "cents": c})
            .groupby(["g", "cents"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        out["vb"] = out["cents"] // DECILE_VSPAN
        return out[["g", "vb", "cents", "cnt"]]

    hist = (
        ds.map_batches(part, batch_format="pandas")
        .groupby(["g", "vb", "cents"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    totals = (
        hist.groupby(["g", "vb"]).aggregate(Sum("cnt", alias_name="t")).to_pandas()
        .sort_values(["g", "vb"])
    )
    totals["base"] = totals.groupby("g")["t"].cumsum() - totals["t"]
    n_of = totals.groupby("g")["t"].sum().to_dict()
    h_of = {g: [(int(n) - 1) * q for q in qs] for g, n in n_of.items()}
    ranks_of = {
        g: sorted({int(np.floor(x)) for x in hs} | {int(np.ceil(x)) for x in hs})
        for g, hs in h_of.items()
    }
    base_of = {(r.g, int(r.vb)): int(r.base) for r in totals.itertuples()}
    ref = ray.put((ranks_of, base_of))

    def lookup(grp: pd.DataFrame) -> pd.DataFrame:
        ranks_map, bases = ray.get(ref)
        grp = grp.sort_values("cents")
        gkey = grp["g"].iloc[0]
        base = bases[(gkey, int(grp["vb"].iloc[0]))]
        cum = grp["cnt"].cumsum().to_numpy()
        loc = [r - base for r in ranks_map[gkey] if 0 <= r - base < cum[-1]]
        if not loc:
            return pd.DataFrame(
                {"g": pd.Series([], dtype=object),
                 "rank": pd.Series([], dtype="int64"),
                 "cents": pd.Series([], dtype="int64")}
            )
        idx = np.searchsorted(cum, np.array(loc, np.int64), side="right")
        return pd.DataFrame(
            {"g": gkey, "rank": np.array(loc, np.int64) + base,
             "cents": grp["cents"].to_numpy()[idx]}
        )

    at = (
        hist.groupby(["g", "vb"]).map_groups(lookup, batch_format="pandas")
        .to_pandas().set_index(["g", "rank"])["cents"]
    )
    rows = []
    for gkey, hs in h_of.items():
        for q, x in zip(qs, hs):
            lo, hi = int(np.floor(x)), int(np.ceil(x))
            v = float(at[(gkey, lo)]) + (x - lo) * (
                float(at[(gkey, hi)]) - float(at[(gkey, lo)])
            )
            rows.append(
                {"o_orderstatus": gkey, "q": q, "value": float(r2(v / 100.0, 2))}
            )
    return pd.DataFrame(rows)


def agg_winsorized_prices(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa
    import ray

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    pct = _grouped_order_percentiles(sf_dir, [WINSOR_LO, WINSOR_HI])
    band_tbl = (
        pct.pivot(index="o_orderstatus", columns="q", values="value")
        .rename(columns={WINSOR_LO: "lo", WINSOR_HI: "hi"})
        .reset_index()
    )
    band_tbl.columns.name = None
    band_ref = ray.put(
        {
            r.o_orderstatus: (round(r.lo * 100), round(r.hi * 100))
            for r in band_tbl.itertuples()
        }
    )

    def clip_partial(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(band_ref)
        cents = np.round(df["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        lo = df["o_orderstatus"].map(lambda s: table[s][0]).to_numpy(np.int64)
        hi = df["o_orderstatus"].map(lambda s: table[s][1]).to_numpy(np.int64)
        clipped = np.minimum(np.maximum(cents, lo), hi)
        out = pd.DataFrame({"o_orderstatus": df["o_orderstatus"], "c": clipped})
        return (
            out.groupby("o_orderstatus", sort=False)
            .agg(sum_c=("c", "sum"), n=("c", "size"))
            .reset_index()
        )

    parts = (
        ds.map_batches(clip_partial, batch_format="pandas")
        .groupby("o_orderstatus")
        .aggregate(Sum("sum_c", alias_name="sum_c"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    out = band_tbl.merge(parts, on="o_orderstatus")
    out["avg_winsorized"] = r2(
        out["sum_c"].to_numpy(np.float64) / (out["n"].to_numpy(np.float64) * 100.0), 6
    )
    out["n"] = out["n"].astype("int64")
    return out[["o_orderstatus", "lo", "hi", "n", "avg_winsorized"]]


AGG_WINSORIZED_SQL = f"""
WITH b AS (
  SELECT o_orderstatus,
         ROUND(quantile_cont(o_totalprice, {WINSOR_LO}), 2) AS lo,
         ROUND(quantile_cont(o_totalprice, {WINSOR_HI}), 2) AS hi
  FROM orders GROUP BY o_orderstatus
), c AS (
  SELECT o.o_orderstatus, b.lo, b.hi,
         LEAST(GREATEST(CAST(ROUND(o.o_totalprice * 100.0) AS BIGINT),
                        CAST(ROUND(b.lo * 100.0) AS BIGINT)),
               CAST(ROUND(b.hi * 100.0) AS BIGINT)) AS cents
  FROM orders o JOIN b USING (o_orderstatus)
)
SELECT o_orderstatus, lo, hi, COUNT(*)::BIGINT AS n,
       ROUND(SUM(cents)::DOUBLE / (COUNT(*)::DOUBLE * 100.0), 6) AS avg_winsorized
FROM c GROUP BY o_orderstatus, lo, hi
"""


# --------------------------------------------------------------------------
# Time-weighted average: each event's value weighted by the whole seconds
# until the user's next event (the "state held for duration" semantic —
# last event of a user carries no weight). Same bucketized ordered fold as
# sessionize; weights are integer seconds so the denominator is exact and
# the numerator's float summation drift sits far below the 6-dp rounding.


def events_time_weighted_avg(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], 255), pa.int32())
        )

    def twa_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # second-BOUNDARY count, matching SQL date_diff('second', …):
        # floor each timestamp to seconds first, then subtract
        sec = g["ts"].to_numpy().astype("datetime64[us]").view("int64") // 1_000_000
        next_sec = np.roll(sec, -1)
        same = g["user_id"].eq(g["user_id"].shift(-1)).to_numpy()
        dt = np.where(same, next_sec - sec, 0)
        num = g["value"].to_numpy() * dt
        agg = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "num": num, "den": dt})
        out = (
            agg.groupby("user_id", sort=False)[["num", "den"]].sum().reset_index()
        )
        out = out[out["den"] > 0]
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "tw_avg": r2(out["num"] / out["den"], 6),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(twa_bucket, batch_format="pandas")
        .to_pandas()
    )


EVENTS_TIME_WEIGHTED_AVG_SQL = """
WITH s AS (
  SELECT user_id, value,
         date_diff('second', ts,
                   LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         ) AS dt
  FROM events
)
SELECT user_id, ROUND(SUM(value * dt) / SUM(dt), 6) AS tw_avg
FROM s WHERE dt IS NOT NULL
GROUP BY user_id HAVING SUM(dt) > 0
"""


# --------------------------------------------------------------------------
# Z-score outlier detection: flag events whose value sits ≥ 2 population
# standard deviations from the user's own mean — the per-entity anomaly
# pass of a metrics pipeline. Both the sufficient statistics (n, Σv, Σv²)
# and the flagged events are resolved BUCKET-LOCALLY (user_id & 255), so
# the corpus crosses exactly one exchange and no per-user table is ever
# broadcast or driver-resident (users are unbounded at scale; buckets are
# not). The variance formula (ss/n − mean²), guard (max(·,0)), division
# association and 6-dp half-away rounding are mirrored verbatim in SQL.

ZSCORE_THRESHOLD = 2.0


def events_zscore_outliers(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], 255), pa.int32())
        )

    def flag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(np.float64)
        stats = (
            pd.DataFrame({"user_id": g["user_id"], "v": v, "vv": v * v})
            .groupby("user_id", sort=False)
            .agg(n=("v", "size"), sv=("v", "sum"), svv=("vv", "sum"))
        )
        mean = stats["sv"] / stats["n"]
        sd = np.sqrt(np.maximum(stats["svv"] / stats["n"] - mean * mean, 0.0))
        mean_r = g["user_id"].map(mean).to_numpy(np.float64)
        sd_r = g["user_id"].map(sd).to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = r2((v - mean_r) / sd_r, 6)
        keep = (sd_r > 0) & (np.abs(z) >= ZSCORE_THRESHOLD)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[keep],
                "user_id": g["user_id"].to_numpy()[keep],
                "z": z[keep],
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(flag_bucket, batch_format="pandas")
        .to_pandas()
    )


EVENTS_ZSCORE_SQL = f"""
WITH s AS (
  SELECT user_id, COUNT(*)::DOUBLE AS n, SUM(value) AS sv,
         SUM(value * value) AS svv
  FROM events GROUP BY user_id
), p AS (
  SELECT user_id, sv / n AS mean,
         sqrt(GREATEST(svv / n - (sv / n) * (sv / n), 0.0)) AS sd
  FROM s
)
SELECT e.event_id, e.user_id,
       ROUND((e.value - p.mean) / p.sd, 6) AS z
FROM events e JOIN p USING (user_id)
WHERE p.sd > 0
  AND ABS(ROUND((e.value - p.mean) / p.sd, 6)) >= {ZSCORE_THRESHOLD}
"""


# --------------------------------------------------------------------------
# Grouped mode: the most frequent order priority per order status with a
# deterministic lexicographic tie-break — two-stage (the only exchange is
# the map-side-combined (status, priority) count groupby; the argmax runs
# on the driver over a |statuses| × |priorities| ≤ dozens table).


def agg_grouped_mode(sf_dir: str) -> pd.DataFrame:
    counts = (
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(
            ["o_orderstatus", "n", "o_orderpriority"],
            ascending=[True, False, True],
            kind="mergesort",
        )
    )
    out = counts.groupby("o_orderstatus", sort=True).head(1).reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out.rename(columns={"o_orderpriority": "mode_priority"})[
        ["o_orderstatus", "mode_priority", "n"]
    ]


AGG_GROUPED_MODE_SQL = """
SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
  SELECT o_orderstatus, o_orderpriority, COUNT(*)::BIGINT AS n,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderstatus
           ORDER BY COUNT(*) DESC, o_orderpriority
         ) AS r
  FROM orders GROUP BY o_orderstatus, o_orderpriority
) WHERE r = 1
"""


# --------------------------------------------------------------------------
# Debounce filter: keep an event only if ≥ DEBOUNCE_SECONDS have passed
# since the same user's previous event (gap semantics — LAG-based, so each
# event compares to its immediate predecessor, not the last kept one).
# The streaming rate-limit/dedup stage of an event ingest. Same bucketized
# ordered fold as sessionize: one exchange, integer-second boundary
# arithmetic (date_diff semantics), all-integer output.

DEBOUNCE_SECONDS = 3600


def events_debounce(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], 255), pa.int32())
        )

    def keep_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        sec = g["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        prev = np.roll(sec, 1)
        same = g["user_id"].eq(g["user_id"].shift(1)).to_numpy()
        keep = ~same | ((sec - prev) > DEBOUNCE_SECONDS)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[keep],
                "user_id": g["user_id"].to_numpy()[keep],
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(keep_bucket, batch_format="pandas")
        .to_pandas()
    )


EVENTS_DEBOUNCE_SQL = f"""
WITH s AS (
  SELECT event_id, user_id,
         date_diff('second',
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS dt
  FROM events
)
SELECT event_id, user_id FROM s
WHERE dt IS NULL OR dt > {DEBOUNCE_SECONDS}
"""


# --------------------------------------------------------------------------
# Equi-depth decile histogram with EXACT global quantile edges — distributed
# order statistics without a global sort. The classic two-phase rank
# lookup over a value-bucketed histogram:
#   1. ONE combinable exchange builds the (value_bucket, cents) → count
#      histogram (duplicates collapse map-side; distinct prices are
#      value-domain-bounded, not row-bounded).
#   2. Per-value-bucket totals (O(buckets) rows) give the driver exclusive
#      prefix counts; each needed global rank (floor/ceil of the nine
#      decile positions + min/max) is then resolved INSIDE the one value
#      bucket that contains it — a local sorted cumsum lookup.
#   3. Edges interpolate exactly like quantile_cont / np.percentile
#      (v_lo + frac·(v_hi − v_lo), frac = (n−1)q − ⌊(n−1)q⌋), are rounded
#      to 2 dp on both sides, and the per-decile row counts come from a
#      second pass over the (materialized, distinct-value-sized) histogram
#      — the raw table is read exactly once.

N_DECILES = 10
DECILE_VSPAN = 5_000_000  # cents per value bucket


def _cents_histogram(sf_dir: str):
    """Shared first phase of the order-statistics ops: the materialized
    (vb, cents) → count histogram of order prices plus per-vb totals with
    exclusive prefix counts (vb order == value order)."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        c = np.round(df["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        vc = pd.Series(c).value_counts()
        cents = vc.index.to_numpy(np.int64)
        return pd.DataFrame(
            {"vb": cents // DECILE_VSPAN, "cents": cents, "cnt": vc.to_numpy(np.int64)}
        )

    hist = (
        ds.map_batches(part, batch_format="pandas")
        .groupby(["vb", "cents"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()  # distinct-value-sized; reused across phases
    )
    totals = (
        hist.groupby("vb").aggregate(Sum("cnt", alias_name="t")).to_pandas()
        .sort_values("vb")
    )
    totals["base"] = totals["t"].cumsum() - totals["t"]
    return hist, totals


def agg_equidepth_deciles(sf_dir: str) -> pd.DataFrame:
    import ray

    hist, totals = _cents_histogram(sf_dir)
    n = int(totals["t"].sum())
    h = [(n - 1) * d / N_DECILES for d in range(1, N_DECILES)]
    ranks = sorted({0, n - 1} | {int(np.floor(x)) for x in h} | {int(np.ceil(x)) for x in h})
    base_of = dict(zip(totals["vb"].astype(int), totals["base"].astype(int)))
    rank_ref = ray.put((ranks, base_of))

    def rank_lookup(g: pd.DataFrame) -> pd.DataFrame:
        rks, bases = ray.get(rank_ref)
        g = g.sort_values("cents")
        base = bases[int(g["vb"].iloc[0])]
        cum = g["cnt"].cumsum().to_numpy()
        local = [r - base for r in rks if 0 <= r - base < cum[-1]]
        if not local:
            return pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                                 "cents": pd.Series([], dtype="int64")})
        idx = np.searchsorted(cum, np.array(local, dtype=np.int64), side="right")
        return pd.DataFrame(
            {"rank": np.array(local, dtype=np.int64) + base,
             "cents": g["cents"].to_numpy()[idx]}
        )

    at_rank = (
        hist.groupby("vb").map_groups(rank_lookup, batch_format="pandas")
        .to_pandas().set_index("rank")["cents"]
    )
    edges = []
    for x in h:
        lo, hi = int(np.floor(x)), int(np.ceil(x))
        v = float(at_rank[lo]) + (x - lo) * (float(at_rank[hi]) - float(at_rank[lo]))
        edges.append(float(r2(v / 100.0, 2)))
    emin = float(r2(at_rank[0] / 100.0, 2))
    emax = float(r2(at_rank[n - 1] / 100.0, 2))
    edges_arr = np.array(edges, dtype=np.float64)

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        b = np.searchsorted(edges_arr, df["cents"].to_numpy(np.float64) / 100.0, side="left")
        out = pd.DataFrame({"bucket": b.astype(np.int64), "n": df["cnt"].to_numpy(np.int64)})
        return out.groupby("bucket", as_index=False).sum()

    counts = (
        hist.map_batches(bucket_counts, batch_format="pandas")
        .groupby("bucket").aggregate(Sum("n", alias_name="n")).to_pandas()
    )
    bounds = [emin] + edges + [emax]
    out = counts.sort_values("bucket").reset_index(drop=True)
    out["lo"] = [bounds[int(b)] for b in out["bucket"]]
    out["hi"] = [bounds[int(b) + 1] for b in out["bucket"]]
    out["bucket"] = out["bucket"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out[["bucket", "lo", "hi", "n"]]


def _equidepth_sql() -> str:
    edge_selects = "\n  UNION ALL ".join(
        f"SELECT {d} AS d, ROUND(quantile_cont(cents, {d / N_DECILES}) / 100.0, 2) AS edge FROM c"
        for d in range(1, N_DECILES)
    )
    return f"""
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents FROM orders
), e AS (
  {edge_selects}
), mm AS (
  SELECT ROUND(MIN(cents) / 100.0, 2) AS mn, ROUND(MAX(cents) / 100.0, 2) AS mx FROM c
), b AS (
  SELECT cents,
         (SELECT COUNT(*) FROM e WHERE e.edge < c.cents::DOUBLE / 100.0) AS bucket
  FROM c
)
SELECT b.bucket::BIGINT AS bucket,
       COALESCE(el.edge, (SELECT mn FROM mm)) AS lo,
       COALESCE(eh.edge, (SELECT mx FROM mm)) AS hi,
       COUNT(*)::BIGINT AS n
FROM b
LEFT JOIN e el ON el.d = b.bucket
LEFT JOIN e eh ON eh.d = b.bucket + 1
GROUP BY b.bucket, lo, hi
"""


AGG_EQUIDEPTH_SQL = _equidepth_sql()


# --------------------------------------------------------------------------
# Pairwise Pearson correlation matrix from ONE streaming pass of
# sufficient statistics: each batch folds (n, Σx, Σx², Σxy for every
# column pair) into a single partial row — 15 scalars per block — and the
# driver reduces blocks and applies the closed form. The corpus is read
# once, nothing shuffles. The formula ((nΣxy − ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²
# −(Σy)²))), association order and 6-dp rounding are mirrored in SQL
# (NOT SQL's corr(): its streaming covariance is a different summation).

CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def agg_corr_matrix(sf_dir: str) -> pd.DataFrame:
    cols = CORR_COLS
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        row = {"n": np.float64(len(df))}
        v = {c: df[c].to_numpy(np.float64) for c in cols}
        for c in cols:
            row[f"s_{c}"] = v[c].sum()
            row[f"ss_{c}"] = (v[c] * v[c]).sum()
        for a, b in pairs:
            row[f"sp_{a}_{b}"] = (v[a] * v[b]).sum()
        return pd.DataFrame([row])

    parts = (
        _read(sf_dir, "lineitem", cols)
        .map_batches(partial, batch_format="pandas")
        .to_pandas()  # n_blocks rows of 15 scalars
        .sum()
    )
    n = parts["n"]
    out = []
    for a, b in pairs:
        num = n * parts[f"sp_{a}_{b}"] - parts[f"s_{a}"] * parts[f"s_{b}"]
        den = np.sqrt(
            (n * parts[f"ss_{a}"] - parts[f"s_{a}"] * parts[f"s_{a}"])
            * (n * parts[f"ss_{b}"] - parts[f"s_{b}"] * parts[f"s_{b}"])
        )
        out.append({"col_a": a, "col_b": b, "corr": float(r2(num / den, 6))})
    return pd.DataFrame(out)


def _corr_sql() -> str:
    cols = CORR_COLS
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    sums = ["COUNT(*)::DOUBLE AS n"]
    for c in cols:
        sums.append(f"SUM({c}) AS s_{c}")
        sums.append(f"SUM({c} * {c}) AS ss_{c}")
    for a, b in pairs:
        sums.append(f"SUM({a} * {b}) AS sp_{a}_{b}")
    selects = [
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
       ROUND((n * sp_{a}_{b} - s_{a} * s_{b})
             / sqrt((n * ss_{a} - s_{a} * s_{a})
                    * (n * ss_{b} - s_{b} * s_{b})), 6) AS corr
FROM s"""
        for a, b in pairs
    ]
    return (
        "WITH s AS (\n  SELECT " + ",\n         ".join(sums) + "\n  FROM lineitem\n)\n"
        + "\nUNION ALL ".join(selects)
    )


AGG_CORR_MATRIX_SQL = _corr_sql()


# --------------------------------------------------------------------------
# Calendar gap-fill (timeseries densification): per-user daily event
# counts INCLUDING explicit zero rows for silent days between the user's
# first and last active day — what a downstream per-day model join needs.
# Same one-exchange bucketized fold (user ranges and day counts are both
# bucket-local); the day fan-out is pure map-side generation bounded by
# each user's own activity span.


def events_gap_fill(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], 255), pa.int32())
        )

    def fill_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized: per-(user, day) counts, per-user [d0, d1] spans,
        # repeat/arange fan-out of the dense calendar, then scatter counts
        day_i = g["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        counts = (
            pd.DataFrame({"user_id": g["user_id"].to_numpy(), "d": day_i})
            .groupby(["user_id", "d"], sort=True)
            .size()
            .reset_index(name="n")
        )
        spans = counts.groupby("user_id", sort=True)["d"].agg(["min", "max", "size"])
        span_len = (spans["max"] - spans["min"] + 1).to_numpy(np.int64)
        users = np.repeat(spans.index.to_numpy(np.int64), span_len)
        starts = np.repeat(spans["min"].to_numpy(np.int64), span_len)
        offsets = np.concatenate([np.arange(k) for k in span_len]) if len(span_len) else np.array([], dtype=np.int64)
        days = starts + offsets
        n = np.zeros(len(days), dtype=np.int64)
        # position of each active (user, day) in the dense output: the
        # user's span start index + day offset (counts and spans share the
        # same user_id sort order)
        base = np.repeat(np.concatenate(([0], span_len.cumsum()[:-1])), spans["size"].to_numpy(np.int64))
        first = np.repeat(spans["min"].to_numpy(np.int64), spans["size"].to_numpy(np.int64))
        n[base + (counts["d"].to_numpy(np.int64) - first)] = counts["n"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": users,
                "day": np.datetime_as_string(days.astype("datetime64[D]"), unit="D"),
                "n": n,
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fill_bucket, batch_format="pandas")
        .to_pandas()
    )


EVENTS_GAP_FILL_SQL = """
WITH d AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*)::BIGINT AS n
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), r AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM d GROUP BY user_id
), cal AS (
  SELECT user_id,
         unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM r
)
SELECT c.user_id, strftime(c.day, '%Y-%m-%d') AS day,
       COALESCE(d.n, 0)::BIGINT AS n
FROM cal c LEFT JOIN d ON d.user_id = c.user_id AND d.day = c.day
"""


# --------------------------------------------------------------------------
# Gini concentration of order prices — the inequality statistic, computed
# WITHOUT a global sort from the same value-bucketed histogram as the
# decile op: Σ rank·value decomposes over runs of equal values
# (Σ ranks of a cnt-long run starting at first-rank f is cnt·f +
# cnt(cnt−1)/2 — pure integers), each value bucket resolves its runs from
# the broadcast prefix-count bases, and Σ rank·value is tie-order
# invariant, so the SQL mirror can use a plain ROW_NUMBER. Only the final
# ratio is float (identical association both sides, 6-dp rounded).


def agg_gini_concentration(sf_dir: str) -> pd.DataFrame:
    import ray

    hist, totals = _cents_histogram(sf_dir)
    base_of = dict(zip(totals["vb"].astype(int), totals["base"].astype(int)))
    base_ref = ray.put(base_of)

    def rank_weighted(g: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(base_ref)
        g = g.sort_values("cents")
        cnt = g["cnt"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        first = bases[int(g["vb"].iloc[0])] + np.concatenate(([0], cnt.cumsum()[:-1])) + 1
        # exact integer arithmetic in python ints (immune to 64-bit
        # overflow at any scale)
        s = int(sum(int(c) * (int(k) * int(f) + int(k) * (int(k) - 1) // 2)
                    for c, k, f in zip(cents, cnt, first)))
        t = int((cnt * cents).sum())
        return pd.DataFrame({"s": [str(s)], "t": [str(t)], "n": [str(int(cnt.sum()))]})

    parts = (
        hist.groupby("vb").map_groups(rank_weighted, batch_format="pandas").to_pandas()
    )
    s = sum(int(x) for x in parts["s"])
    t = sum(int(x) for x in parts["t"])
    n = sum(int(x) for x in parts["n"])
    gini = float(r2(2.0 * float(s) / (float(n) * float(t)) - (n + 1.0) / n, 6))
    return pd.DataFrame({"gini": [gini], "n": [np.int64(n)]})


AGG_GINI_SQL = """
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents FROM orders
), r AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM c
)
SELECT ROUND(2.0 * SUM(rn * cents)::DOUBLE
             / (COUNT(*)::DOUBLE * SUM(cents)::DOUBLE)
       - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini,
       COUNT(*)::BIGINT AS n
FROM r
"""


# --------------------------------------------------------------------------
# CUBE: the full OLAP lattice over (orderstatus, orderpriority) — every
# 2^k grouping set. Same scale shape as agg_rollup: ONE distributed
# groupby at the finest grain (the only exchange; combiner-style, cells
# bounded by the dimensions' cross product), then the coarser grouping
# sets derive from the fine cells on the driver with exact integer sums.


def agg_cube(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "o_orderpriority": t["o_orderpriority"],
                "cents": cents,
            }
        )

    fine = (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("cents", alias_name="sum_cents"), Count(alias_name="n"))
        .to_pandas()  # |status| × |priority| cells — constant-bounded
    )
    vals = ["sum_cents", "n"]
    levels = [
        fine.rename(
            columns={"o_orderstatus": "orderstatus", "o_orderpriority": "orderpriority"}
        )
    ]
    by_status = (
        fine.groupby("o_orderstatus", as_index=False)[vals].sum()
        .rename(columns={"o_orderstatus": "orderstatus"})
    )
    by_status["orderpriority"] = "ALL"
    levels.append(by_status)
    by_prio = (
        fine.groupby("o_orderpriority", as_index=False)[vals].sum()
        .rename(columns={"o_orderpriority": "orderpriority"})
    )
    by_prio["orderstatus"] = "ALL"
    levels.append(by_prio)
    top = fine[vals].sum().to_frame().T
    top["orderstatus"] = "ALL"
    top["orderpriority"] = "ALL"
    levels.append(top)
    out = pd.concat(levels, ignore_index=True)[
        ["orderstatus", "orderpriority", "sum_cents", "n"]
    ]
    return (
        out.astype({"sum_cents": "int64", "n": "int64"})
        .sort_values(["orderstatus", "orderpriority"])
        .reset_index(drop=True)
    )


AGG_CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))::BIGINT AS sum_cents,
       COUNT(*)::BIGINT AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# Distribution drift: KL(P_status || P_global) of the order-price
# distribution over fixed value buckets — the monitoring statistic a
# pipeline uses to detect per-segment drift from the corpus-wide
# distribution. ONE combinable (status, bucket) count exchange; the
# (statuses × buckets) table is constant-bounded and folds on the driver;
# Laplace +1 smoothing over the GLOBAL bucket domain keeps every log
# finite. ~dozen summands → 6-dp rounding far above drift.

KL_BUCKET_SPAN = 50_000.0


def agg_kl_price_drift(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            pd.DataFrame(
                {
                    "o_orderstatus": df["o_orderstatus"],
                    "vb": np.floor(
                        df["o_totalprice"].to_numpy(np.float64) / KL_BUCKET_SPAN
                    ).astype(np.int64),
                }
            )
            .groupby(["o_orderstatus", "vb"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        return out.astype({"vb": "int64", "c": "int64"})

    cnt = (
        ds.map_batches(part, batch_format="pandas")
        .to_pandas()  # statuses × buckets × n_blocks — constant-bounded
        .groupby(["o_orderstatus", "vb"], as_index=False)
        .sum()
    )
    buckets = np.sort(cnt["vb"].unique())
    n_b = len(buckets)
    glob = cnt.groupby("vb")["c"].sum()
    n_g = float(glob.sum())
    q = {int(b): (float(glob.get(b, 0)) + 1.0) / (n_g + n_b) for b in buckets}
    rows = []
    for status, g in cnt.groupby("o_orderstatus"):
        by_b = g.set_index("vb")["c"]
        n_s = float(by_b.sum())
        kl = 0.0
        for b in buckets:
            p = (float(by_b.get(b, 0)) + 1.0) / (n_s + n_b)
            kl += p * math.log(p / q[int(b)])
        rows.append(
            {"o_orderstatus": status, "n_orders": int(n_s),
             "kl_divergence": float(r2(kl, 6))}
        )
    return (
        pd.DataFrame(rows)
        .astype({"n_orders": "int64"})
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )


AGG_KL_PRICE_DRIFT_SQL = f"""
WITH c AS (
  SELECT o_orderstatus, FLOOR(o_totalprice / {KL_BUCKET_SPAN})::BIGINT AS vb,
         COUNT(*)::BIGINT AS c
  FROM orders GROUP BY o_orderstatus, vb
),
b AS (SELECT DISTINCT vb FROM c),
nb AS (SELECT COUNT(*)::DOUBLE AS n_b FROM b),
g AS (SELECT vb, SUM(c)::DOUBLE AS cg FROM c GROUP BY vb),
ng AS (SELECT SUM(cg) AS n_g FROM g),
s AS (SELECT o_orderstatus, SUM(c)::DOUBLE AS n_s FROM c GROUP BY o_orderstatus),
grid AS (
  SELECT s.o_orderstatus, s.n_s, b.vb,
         COALESCE(g.cg, 0) AS cg, COALESCE(cs.c, 0) AS cs
  FROM s CROSS JOIN b
  LEFT JOIN g USING (vb)
  LEFT JOIN c cs ON cs.o_orderstatus = s.o_orderstatus AND cs.vb = b.vb
)
SELECT o_orderstatus, ANY_VALUE(n_s)::BIGINT AS n_orders,
       ROUND(SUM(
         ((cs + 1.0) / (n_s + (SELECT n_b FROM nb)))
         * ln(((cs + 1.0) / (n_s + (SELECT n_b FROM nb)))
              / ((cg + 1.0) / ((SELECT n_g FROM ng) + (SELECT n_b FROM nb))))
       ), 6) AS kl_divergence
FROM grid GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Windowed top-k: the top-3 event types per hourly tumbling window — the
# classic streaming leaderboard primitive. ONE combinable (window, type)
# count exchange; the (windows × types) table is bounded by time-range ×
# type-cardinality and folds + ranks on the driver. Rank determinism:
# count desc, then event_type asc (integer + string keys — no floats).

WTOPK_K = 3


def events_windowed_topk(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        hours = df["ts"].dt.floor("h")
        out = (
            pd.DataFrame({"window_start": hours, "event_type": df["event_type"]})
            .groupby(["window_start", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return out.astype({"n": "int64"})

    cnt = (
        ds.map_batches(part, batch_format="pandas")
        .to_pandas()  # windows × types × n_blocks — time/type-bounded
        .groupby(["window_start", "event_type"], as_index=False)
        .sum()
    )
    cnt = cnt.sort_values(
        ["window_start", "n", "event_type"], ascending=[True, False, True]
    )
    cnt["rank"] = cnt.groupby("window_start").cumcount() + 1
    out = cnt[cnt["rank"] <= WTOPK_K].reset_index(drop=True)
    out["window_start"] = out["window_start"].dt.strftime("%Y-%m-%d %H:%M:%S")
    return out.astype({"n": "int64", "rank": "int64"})[
        ["window_start", "event_type", "n", "rank"]
    ]


EVENTS_WINDOWED_TOPK_SQL = f"""
WITH c AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, COUNT(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, n, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY window_start ORDER BY n DESC, event_type) AS rank
  FROM c
) WHERE rank <= {WTOPK_K}
"""


# --------------------------------------------------------------------------
# Benford first-digit deviation per order status — the data-quality audit
# that flags fabricated or truncated numeric columns. ONE combinable
# (status, digit) count exchange (≤ statuses × 9 cells); chi-square
# statistic vs the Benford expectation computed on the driver, rounded.

BENFORD_P = {d: math.log10(1 + 1.0 / d) for d in range(1, 10)}


def agg_benford_deviation(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        first = (
            df["o_totalprice"].abs().astype("int64").astype(str).str[0].astype("int64")
        )
        out = (
            pd.DataFrame({"o_orderstatus": df["o_orderstatus"], "digit": first})
            .groupby(["o_orderstatus", "digit"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        return out.astype({"digit": "int64", "c": "int64"})

    cnt = (
        ds.map_batches(part, batch_format="pandas")
        .to_pandas()  # statuses × 9 × n_blocks — constant-bounded
        .groupby(["o_orderstatus", "digit"], as_index=False)
        .sum()
    )
    rows = []
    for status, g in cnt.groupby("o_orderstatus"):
        by_d = g.set_index("digit")["c"]
        n = float(by_d.sum())
        chi2 = 0.0
        for d in range(1, 10):
            exp = n * BENFORD_P[d]
            obs = float(by_d.get(d, 0))
            chi2 += (obs - exp) ** 2 / exp
        rows.append(
            {"o_orderstatus": status, "n_orders": int(n),
             "chi2_benford": float(r2(chi2, 4))}
        )
    return (
        pd.DataFrame(rows)
        .astype({"n_orders": "int64"})
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )


AGG_BENFORD_SQL = """
WITH c AS (
  SELECT o_orderstatus,
         substr(CAST(CAST(FLOOR(abs(o_totalprice)) AS BIGINT) AS VARCHAR), 1, 1)::BIGINT
           AS digit,
         COUNT(*)::BIGINT AS c
  FROM orders GROUP BY 1, 2
),
s AS (SELECT o_orderstatus, SUM(c)::DOUBLE AS n FROM c GROUP BY o_orderstatus),
grid AS (
  SELECT s.o_orderstatus, s.n, d.digit,
         COALESCE(c.c, 0)::DOUBLE AS obs,
         s.n * log10(1 + 1.0 / d.digit) AS exp
  FROM s CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS digit) d
  LEFT JOIN c ON c.o_orderstatus = s.o_orderstatus AND c.digit = d.digit
)
SELECT o_orderstatus, ANY_VALUE(n)::BIGINT AS n_orders,
       ROUND(SUM((obs - exp) * (obs - exp) / exp), 4) AS chi2_benford
FROM grid GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Per-user EWMA of the event value stream (α = 1/2) — the streaming
# smoothing primitive (anomaly baselines, rate estimators). The recurrence
# ewma_t = (v_t + ewma_{t-1}) / 2 is inherently ordered, so it runs as the
# repo's bucketized per-user ordered fold (ONE exchange; users are the
# parallel unit). α = 1/2 makes every value a dyadic rational, so the
# float64 recurrence is bit-identical across engines (the autothrottle
# contract); output rounded to 6 dp anyway. Order: (ts, event_id) —
# deterministic under timestamp ties. Oracle: recursive CTE over a dense
# per-user ROW_NUMBER sequence.

EWMA_BUCKETS = 64


def events_ewma_value(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ub"] = (df["user_id"].astype("int64") % EWMA_BUCKETS).astype("int64")
        return df

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        out = {"user_id": [], "n_events": [], "ewma_value": []}
        for uid, per in g.groupby("user_id", sort=False):
            ew = 0.0
            for v in per["value"].to_numpy(np.float64):
                ew = (v + ew) / 2.0
            out["user_id"].append(int(uid))
            out["n_events"].append(len(per))
            out["ewma_value"].append(float(r2(ew, 6)))
        return pd.DataFrame(out).astype({"user_id": "int64", "n_events": "int64"})

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("ub")
        .map_groups(fold_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


EVENTS_EWMA_SQL = """
WITH RECURSIVE ev AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS seq,
         value
  FROM events
),
rec(user_id, seq, ew) AS (
  SELECT user_id, -1::BIGINT, 0.0::DOUBLE
  FROM (SELECT DISTINCT user_id FROM ev)
  UNION ALL
  SELECT rec.user_id, e.seq, (e.value + rec.ew) / 2.0
  FROM rec JOIN ev e ON e.user_id = rec.user_id AND e.seq = rec.seq + 1
),
fin AS (
  SELECT user_id, ew,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
  FROM rec
),
n AS (SELECT user_id, COUNT(*)::BIGINT AS n_events FROM ev GROUP BY user_id)
SELECT n.user_id, n.n_events, ROUND(f.ew, 6) AS ewma_value
FROM n JOIN fin f ON f.user_id = n.user_id AND f.rn = 1
"""


# --------------------------------------------------------------------------
# Per-user Holt double exponential smoothing (level + trend) — the EWMA
# op's big sibling: forecast-capable streaming smoothing (capacity
# planning, rate trend alarms). alpha = beta = 1/2 keeps every operation a
# dyadic halving, so the coupled (level, trend) recurrence is bit-identical
# across engines with NO rounding slack needed until the final 6-dp
# presentation round — the EWMA/autothrottle determinism contract extended
# to a two-variable state. Same bucketized per-user ordered fold (ONE
# exchange); oracle is a recursive CTE carrying the (level, trend) pair.
# Init: level_0 = v_0, trend_0 = 0; for t >= 1:
#   level_t = (v_t + (level_{t-1} + trend_{t-1})) / 2
#   trend_t = ((level_t - level_{t-1}) + trend_{t-1}) / 2


def events_holt_smoothing(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ub"] = (df["user_id"].astype("int64") % EWMA_BUCKETS).astype("int64")
        return df

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        out = {"user_id": [], "n_events": [], "level": [], "trend": [],
               "forecast": []}
        for uid, per in g.groupby("user_id", sort=False):
            vs = per["value"].to_numpy(np.float64)
            lev, tr = vs[0], 0.0
            for v in vs[1:]:
                nlev = (v + (lev + tr)) / 2.0
                tr = ((nlev - lev) + tr) / 2.0
                lev = nlev
            out["user_id"].append(int(uid))
            out["n_events"].append(len(per))
            out["level"].append(float(r2(lev, 6)))
            out["trend"].append(float(r2(tr, 6)))
            out["forecast"].append(float(r2(lev + tr, 6)))
        return pd.DataFrame(out).astype({"user_id": "int64", "n_events": "int64"})

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("ub")
        .map_groups(fold_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


EVENTS_HOLT_SQL = """
WITH RECURSIVE ev AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS seq,
         value
  FROM events
),
rec(user_id, seq, lev, tr) AS (
  SELECT user_id, 0::BIGINT, value::DOUBLE, 0.0::DOUBLE
  FROM ev WHERE seq = 0
  UNION ALL
  SELECT rec.user_id, e.seq,
         (e.value + (rec.lev + rec.tr)) / 2.0,
         (((e.value + (rec.lev + rec.tr)) / 2.0 - rec.lev) + rec.tr) / 2.0
  FROM rec JOIN ev e ON e.user_id = rec.user_id AND e.seq = rec.seq + 1
),
fin AS (
  SELECT user_id, lev, tr,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
  FROM rec
),
n AS (SELECT user_id, COUNT(*)::BIGINT AS n_events FROM ev GROUP BY user_id)
SELECT n.user_id, n.n_events, ROUND(f.lev, 6) AS level,
       ROUND(f.tr, 6) AS trend, ROUND(f.lev + f.tr, 6) AS forecast
FROM n JOIN fin f ON f.user_id = n.user_id AND f.rn = 1
"""


# --------------------------------------------------------------------------
# Market-basket lift: association mining over order baskets (Agrawal &
# Srikant's support/lift framing) — the same count-ratio family as the PMI
# collocation op (ops/webtext.py) but basket-scoped: which part PAIRS
# co-occur in orders more than their popularities predict?
#
# Scale shape: orders are hash-bucketed (orderkey & 255 — each basket lands
# in exactly ONE bucket, so bucket-local DISTINCT and pair fan-out are
# globally exact). Inside a bucket everything is vectorized: dedupe
# (order, part), self-merge on orderkey for pairs (bounded by basket size²,
# ≤ 7 lineitems in this schema), value_counts for partials. One bucket
# exchange + one (p1,p2) groupby-sum exchange over pair-vocab-sized
# partials; item supports and the order total ride the SAME exchange as
# sentinel rows (p2 = -1 / p1 = -1), so the raw lineitem stream crosses
# exactly two exchanges and the score pass runs over the AGGREGATED pair
# table with the catalog-bounded item-support dict broadcast once.
# lift = (c_ab · N) / (c_a · c_b): integer-exact products, ONE inexact
# division, 6-dp round mirrored in the oracle — hash-stable.
BASKET_MIN_SUPPORT = 2
BASKET_TOPK = 25
_BK = 256


def basket_lift(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "bk", pc.cast(pc.bit_wise_and(t["l_orderkey"], _BK - 1), pa.int32())
        )

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        b = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        pairs = b.merge(b, on="l_orderkey", suffixes=("_a", "_b"))
        pairs = pairs[pairs["l_partkey_a"] < pairs["l_partkey_b"]]
        pc_ = (
            pairs.groupby(["l_partkey_a", "l_partkey_b"], sort=False)
            .size()
            .reset_index(name="c")
            .rename(columns={"l_partkey_a": "p1", "l_partkey_b": "p2"})
        )
        ic = (
            b.groupby("l_partkey", sort=False).size().reset_index(name="c")
            .rename(columns={"l_partkey": "p1"})
        )
        ic["p2"] = -1  # sentinel: item support
        tot = pd.DataFrame(
            {"p1": [-1], "p2": [-1], "c": [b["l_orderkey"].nunique()]}
        )
        out = pd.concat([pc_, ic[["p1", "p2", "c"]], tot], ignore_index=True)
        return out.astype({"p1": "int64", "p2": "int64", "c": "int64"})

    # merge pair partials across order buckets with the bucketized-fold
    # idiom (hash the PAIR into ≤256 buckets, pandas groupby inside the
    # fold): Ray's groupby().aggregate() pays per-GROUP overhead in the
    # reduce, which at pair-vocabulary cardinality (~10^5 groups even at
    # sf0.01) is two orders of magnitude slower than 256 vectorized folds
    # over the same one exchange.
    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pb"] = ((df["p1"] * 1_000_003 + df["p2"]) % _BK).astype("int64")
        return df

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["p1", "p2"], as_index=False)["c"].sum()
        return out.rename(columns={"c": "cnt"}).astype(
            {"p1": "int64", "p2": "int64", "cnt": "int64"}
        )

    agg = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(pair_partials, batch_format="pandas")
        .map_batches(pair_bucket, batch_format="pandas")
        .groupby("pb")
        .map_groups(fold, batch_format="pandas")
        .materialize()  # pair-vocab-sized; reused for supports + score pass
    )
    side = (
        agg.map_batches(
            lambda df: df[df["p2"] == -1], batch_format="pandas"
        ).to_pandas()  # catalog-bounded
    )
    n_orders = int(side.loc[side["p1"] == -1, "cnt"].iloc[0])
    item = dict(
        zip(side.loc[side["p1"] >= 0, "p1"], side.loc[side["p1"] >= 0, "cnt"])
    )
    import ray as _ray

    item_ref = _ray.put(item)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ic = _ray.get(item_ref)
        df = df[(df["p2"] >= 0) & (df["cnt"] >= BASKET_MIN_SUPPORT)]
        lift = [
            round((c * n_orders) / (ic[a] * ic[b]), 6)
            for a, b, c in zip(df["p1"], df["p2"], df["cnt"])
        ]
        return pd.DataFrame(
            {
                "p1": df["p1"].astype("int64").to_numpy(),
                "p2": df["p2"].astype("int64").to_numpy(),
                "cnt": df["cnt"].astype("int64").to_numpy(),
                "lift": np.array(lift, dtype=np.float64),
            }
        )

    return (
        agg.map_batches(score, batch_format="pandas")
        .sort(["lift", "p1", "p2"], descending=[True, False, False])
        .limit(BASKET_TOPK)
        .to_pandas()
        .astype({"p1": "int64", "p2": "int64", "cnt": "int64"})
    )


BASKET_LIFT_SQL = f"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey)::BIGINT AS n FROM b),
item AS (SELECT l_partkey, COUNT(*)::BIGINT AS c FROM b GROUP BY 1),
pair AS (
  SELECT x.l_partkey AS p1, y.l_partkey AS p2, COUNT(*)::BIGINT AS cnt
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2
)
SELECT p.p1, p.p2, p.cnt,
       ROUND((p.cnt::DOUBLE * n.n) / (i1.c::DOUBLE * i2.c), 6) AS lift
FROM pair p, n
JOIN item i1 ON i1.l_partkey = p.p1
JOIN item i2 ON i2.l_partkey = p.p2
WHERE p.cnt >= {BASKET_MIN_SUPPORT}
ORDER BY lift DESC, p1, p2 LIMIT {BASKET_TOPK}
"""


# --------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quintiles) —
# the classic direct-marketing segmentation (Hughes 1994), and the repo's
# demonstration of the dimension-bounded two-stage window: the order
# STREAM reduces to one row per customer via a distributed groupby of
# integer-exact partials (cents), and the NTILE(5) scoring then runs over
# the CUSTOMER-dim table — bounded like corpus_source_mixture's domain
# fold, not by order volume. At 10^9 customers the scoring pass would
# swap to the select_corpus histogram-rank cut; the aggregate stage is
# unchanged. Tie-break: (dimension DESC, o_custkey) mirrors NTILE's
# first-buckets-get-extra rule deterministically.

RFM_K = 5


def _ntile_desc(df: pd.DataFrame, col: str, k: int = RFM_K) -> pd.Series:
    order = df.sort_values([col, "o_custkey"], ascending=[False, True]).index
    n = len(df)
    base, extra = n // k, n % k
    codes = np.empty(n, dtype=np.int64)
    start = 0
    for b in range(k):
        size = base + (1 if b < extra else 0)
        codes[start : start + size] = b + 1
        start += size
    return pd.Series(codes, index=order).sort_index()


def agg_rfm_segments(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Sum

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderdate": t["o_orderdate"],
                "cents": pc.cast(
                    pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
                ),
            }
        )

    cust = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(to_cents, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Count(alias_name="n_orders"),
            Max("o_orderdate", alias_name="last_order"),
            Sum("cents", alias_name="total_cents"),
        )
        .to_pandas()  # customer-dim bounded (see header)
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )
    cust["n_orders"] = cust["n_orders"].astype("int64")
    cust["total_cents"] = cust["total_cents"].astype("int64")
    cust["r_score"] = _ntile_desc(cust, "last_order")
    cust["f_score"] = _ntile_desc(cust, "n_orders")
    cust["m_score"] = _ntile_desc(cust, "total_cents")
    cust["rfm_code"] = (
        cust["r_score"] * 100 + cust["f_score"] * 10 + cust["m_score"]
    ).astype("int64")
    return cust


AGG_RFM_SQL = f"""
WITH c AS (
  SELECT o_custkey, COUNT(*)::BIGINT AS n_orders,
         MAX(o_orderdate) AS last_order,
         SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))::BIGINT AS total_cents
  FROM orders GROUP BY o_custkey
), s AS (
  SELECT o_custkey, n_orders, last_order, total_cents,
         NTILE({RFM_K}) OVER (ORDER BY last_order DESC, o_custkey)::BIGINT AS r_score,
         NTILE({RFM_K}) OVER (ORDER BY n_orders DESC, o_custkey)::BIGINT AS f_score,
         NTILE({RFM_K}) OVER (ORDER BY total_cents DESC, o_custkey)::BIGINT AS m_score
  FROM c
)
SELECT o_custkey, n_orders, last_order, total_cents, r_score, f_score, m_score,
       (r_score * 100 + f_score * 10 + m_score)::BIGINT AS rfm_code
FROM s ORDER BY o_custkey
"""


# --------------------------------------------------------------------------
# Per-user inter-arrival gap statistics — the traffic-model primitive under
# the politeness/autothrottle family (server-side rate planning reads the
# CLIENT's arrival process the same way AutoThrottle reads latency). Gaps
# are integer seconds (date_diff — exact), the median of an even count is
# a dyadic half-sum (exact in double), so the oracle needs no rounding
# contract at all. Same bucketized per-user ordered fold as EWMA/Holt:
# ONE hash exchange, group-local numpy, no driver state.


def events_interarrival_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ub"] = (df["user_id"].astype("int64") % EWMA_BUCKETS).astype("int64")
        return df

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        out = {"user_id": [], "n_gaps": [], "min_gap_s": [], "median_gap_s": [],
               "max_gap_s": []}
        for uid, per in g.groupby("user_id", sort=False):
            t = per["ts"].to_numpy("datetime64[s]").astype(np.int64)
            if len(t) < 2:
                continue  # no gaps: row omitted (oracle mirrors via HAVING)
            gaps = np.diff(t)
            s = np.sort(gaps)
            n = len(s)
            med = (
                float(s[n // 2])
                if n % 2
                else (float(s[n // 2 - 1]) + float(s[n // 2])) / 2.0
            )
            out["user_id"].append(int(uid))
            out["n_gaps"].append(n)
            out["min_gap_s"].append(int(s[0]))
            out["median_gap_s"].append(med)
            out["max_gap_s"].append(int(s[-1]))
        return pd.DataFrame(out).astype(
            {"user_id": "int64", "n_gaps": "int64", "min_gap_s": "int64",
             "max_gap_s": "int64"}
        )

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("ub")
        .map_groups(fold_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


EVENTS_INTERARRIVAL_SQL = """
WITH o AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), g AS (
  SELECT user_id, date_diff('second', prev, ts)::BIGINT AS gap
  FROM o WHERE prev IS NOT NULL
)
SELECT user_id, COUNT(*)::BIGINT AS n_gaps,
       MIN(gap)::BIGINT AS min_gap_s,
       MEDIAN(gap)::DOUBLE AS median_gap_s,
       MAX(gap)::BIGINT AS max_gap_s
FROM g GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Per-user one-sided CUSUM change detection (Page 1954) — the streaming
# drift alarm a crawl/ingest pipeline runs on per-host latency or error
# streams (the autothrottle's statistical sibling). Decision-interval
# form with reset: s_t = max(0, s_{t-1} + v_t - (TARGET + SLACK)); when
# s_t > THRESHOLD an alarm fires and s resets to 0. Dyadic constants
# (50, 1/2, 100) keep every step an IEEE-exact add/compare, so the
# sequential recurrence is bit-identical across engines (the EWMA/Holt
# determinism contract); 6-dp presentation round only. Same bucketized
# per-user ordered fold (ONE exchange); oracle: recursive CTE carrying
# the (s, n_alarms) pair.

CUSUM_TARGET = 50.0
CUSUM_SLACK = 0.5
CUSUM_H = 100.0


def events_cusum_alarms(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ub"] = (df["user_id"].astype("int64") % EWMA_BUCKETS).astype("int64")
        return df

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        out = {"user_id": [], "n_events": [], "n_alarms": [], "final_cusum": []}
        for uid, per in g.groupby("user_id", sort=False):
            s, alarms = 0.0, 0
            for v in per["value"].to_numpy(np.float64):
                s = max(0.0, s + v - (CUSUM_TARGET + CUSUM_SLACK))
                if s > CUSUM_H:
                    alarms += 1
                    s = 0.0
            out["user_id"].append(int(uid))
            out["n_events"].append(len(per))
            out["n_alarms"].append(alarms)
            out["final_cusum"].append(float(r2(s, 6)))
        return pd.DataFrame(out).astype(
            {"user_id": "int64", "n_events": "int64", "n_alarms": "int64"}
        )

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("ub")
        .map_groups(fold_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


EVENTS_CUSUM_SQL = f"""
WITH RECURSIVE ev AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS seq,
         value
  FROM events
),
rec(user_id, seq, s, alarms) AS (
  SELECT user_id, -1::BIGINT, 0.0::DOUBLE, 0::BIGINT
  FROM (SELECT DISTINCT user_id FROM ev)
  UNION ALL
  SELECT rec.user_id, e.seq,
         CASE WHEN GREATEST(0.0, rec.s + e.value
                            - ({CUSUM_TARGET} + {CUSUM_SLACK})) > {CUSUM_H}
              THEN 0.0
              ELSE GREATEST(0.0, rec.s + e.value
                            - ({CUSUM_TARGET} + {CUSUM_SLACK})) END,
         rec.alarms
         + CASE WHEN GREATEST(0.0, rec.s + e.value
                              - ({CUSUM_TARGET} + {CUSUM_SLACK})) > {CUSUM_H}
                THEN 1 ELSE 0 END
  FROM rec JOIN ev e ON e.user_id = rec.user_id AND e.seq = rec.seq + 1
),
fin AS (
  SELECT user_id, s, alarms,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
  FROM rec
),
n AS (SELECT user_id, COUNT(*)::BIGINT AS n_events FROM ev GROUP BY user_id)
SELECT n.user_id, n.n_events, f.alarms::BIGINT AS n_alarms,
       ROUND(f.s, 6) AS final_cusum
FROM n JOIN fin f ON f.user_id = n.user_id AND f.rn = 1
"""
