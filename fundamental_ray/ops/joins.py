"""Temporal join operators Ray Data lacks natively: as-of join and
range-window join, expressed as bucketized co-partitioned folds.

These extend the reference's join family (SURVEY.md §2.6 — the fetch-join,
latest-wins merge and previous-price lag in database.go) with the two
classic time-series joins a clickstream/webtext pipeline needs:

* **as-of join** — for each purchase event, the latest strictly-prior
  'view' event by the same user (last-touch attribution). DuckDB spells
  this ``ASOF JOIN``; the oracle uses the explicit window form instead so
  the tie-break on equal view timestamps (largest event_id wins) is pinned
  rather than implementation-defined.
* **range-window join** — for each 'signup' event, the count and value-sum
  of the same user's 'click' events inside the following 6-hour window
  ``[ts, ts+6h)`` (conversion attribution).

Scale shape: both sides hash into 256 user buckets (ONE all-to-all
exchange each), and every bucket task joins ALL its users with vectorized
``pd.merge_asof`` over per-user cumulative arrays — no per-key pandas
round-trip, no driver materialization. The range join never enumerates
matching pairs: window aggregates are differences of per-user prefix sums
sampled at the window edges (two merge_asof probes), so a hot user with a
million clicks costs two binary searches per signup, not a million-row
intermediate.
"""

from __future__ import annotations
from fundamental_ray.sources.parquet import read_parquet_clean

import pandas as pd
import pyarrow as pa
import ray.data

BUCKETS = 256

ASOF_COLS = ["event_id", "user_id", "ts", "event_type"]
RANGE_WINDOW_HOURS = 6


def _read_events(
    sf_dir: str, types: tuple[str, ...], columns: list[str]
) -> ray.data.Dataset:
    import pyarrow.dataset as pads

    return read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=columns,
        filter=pads.field("event_type").isin(list(types)),
    )


def _bucketize(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return t.append_column(
        "bucket", pc.cast(pc.bit_wise_and(t["user_id"], BUCKETS - 1), pa.int32())
    )


def asof_prior_view(sf_dir: str) -> pd.DataFrame:
    """Last-touch attribution: purchase ← latest strictly-prior view of the
    same user. Tie on view ts → largest view event_id (matches the oracle's
    ``ORDER BY v.ts DESC, v.event_id DESC`` rank-1 row)."""

    ds = _read_events(
        sf_dir, ("purchase", "view"), ["event_id", "ts", "user_id", "event_type"]
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g["ts"] = g["ts"].astype("datetime64[us]")
        left = (
            g.loc[g["event_type"] == "purchase", ["event_id", "user_id", "ts"]]
            .sort_values(["ts", "event_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        right = (
            g.loc[g["event_type"] == "view", ["event_id", "user_id", "ts"]]
            .rename(columns={"event_id": "view_event_id", "ts": "view_ts"})
            # merge_asof keeps the LAST in-order row among equal keys, so
            # sorting by (view_ts, view_event_id) pins the tie-break
            .sort_values(["view_ts", "view_event_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        out = pd.merge_asof(
            left,
            right,
            left_on="ts",
            right_on="view_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,  # strictly prior: v.ts < p.ts
        )
        # float64 + NaN (not pandas nullable Int64): matches the oracle's
        # NULLable-int representation under the driver's hash normalization,
        # same convention as window_prev_order (analytics.py).
        out["view_event_id"] = out["view_event_id"].astype("float64")
        return out[["event_id", "user_id", "ts", "view_event_id", "view_ts"]]

    return (
        ds.map_batches(_bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .to_pandas()
    )


ASOF_PRIOR_VIEW_SQL = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
m AS (
  SELECT p.event_id, v.event_id AS view_event_id, v.ts AS view_ts,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id ORDER BY v.ts DESC, v.event_id DESC
         ) AS rn
  FROM p JOIN v ON v.user_id = p.user_id AND v.ts < p.ts
)
SELECT p.event_id, p.user_id, p.ts, m.view_event_id, m.view_ts
FROM p LEFT JOIN (SELECT event_id, view_event_id, view_ts FROM m WHERE rn = 1) m
  USING (event_id)
"""


def range_click_window(sf_dir: str) -> pd.DataFrame:
    """Conversion window: per signup, count + value-sum of the same user's
    clicks in ``[ts, ts+6h)``. Window aggregates are prefix-sum differences
    probed with two backward merge_asof lookups (strict: exact window-edge
    timestamps resolve as ``>= start``, ``< end``)."""

    ds = _read_events(
        sf_dir,
        ("signup", "click"),
        ["event_id", "ts", "user_id", "event_type", "value"],
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g["ts"] = g["ts"].astype("datetime64[us]")
        left = (
            g.loc[g["event_type"] == "signup", ["event_id", "user_id", "ts"]]
            .sort_values(["ts", "event_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        clicks = (
            g.loc[g["event_type"] == "click", ["user_id", "ts", "value"]]
            .sort_values(["user_id", "ts"], kind="mergesort")
            .reset_index(drop=True)
        )
        # per-user inclusive prefix count / sum, then global ts order for
        # the asof probes
        grp = clicks.groupby("user_id", sort=False)
        clicks["cum_n"] = grp.cumcount() + 1
        clicks["cum_v"] = grp["value"].cumsum()
        probes = clicks[["user_id", "ts", "cum_n", "cum_v"]].sort_values(
            "ts", kind="mergesort"
        )

        def lt(at: pd.Series) -> pd.DataFrame:
            """clicks strictly before `at`, per signup row: (count, sum)."""
            q = left[["user_id"]].copy()
            q["probe_ts"] = at.to_numpy().astype("datetime64[us]")
            q["__ord"] = range(len(q))
            q = q.sort_values("probe_ts", kind="mergesort")
            hit = pd.merge_asof(
                q,
                probes,
                left_on="probe_ts",
                right_on="ts",
                by="user_id",
                direction="backward",
                allow_exact_matches=False,
            )
            # merge_asof returns a fresh RangeIndex in probe order; restore
            # signup row order via the carried ordinal
            hit = hit.sort_values("__ord", kind="mergesort")
            return pd.DataFrame(
                {
                    "n": hit["cum_n"].fillna(0).to_numpy("int64"),
                    "v": hit["cum_v"].fillna(0.0).to_numpy("float64"),
                },
                index=left.index,
            )

        lo = lt(left["ts"])
        hi = lt(left["ts"] + pd.Timedelta(hours=RANGE_WINDOW_HOURS))
        out = left.copy()
        out["n_clicks_6h"] = hi["n"] - lo["n"]
        from ..pipelines.analytics import r2

        out["click_value_6h"] = r2(hi["v"] - lo["v"], 6)
        return out[["event_id", "user_id", "ts", "n_clicks_6h", "click_value_6h"]]

    return (
        ds.map_batches(_bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .to_pandas()
    )


RANGE_CLICK_WINDOW_SQL = f"""
WITH s AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT s.event_id, s.user_id, s.ts,
       COUNT(c.ts)::BIGINT AS n_clicks_6h,
       ROUND(COALESCE(SUM(c.value), 0), 6) AS click_value_6h
FROM s LEFT JOIN c
  ON c.user_id = s.user_id
 AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL {RANGE_WINDOW_HOURS} HOUR
GROUP BY s.event_id, s.user_id, s.ts
"""


# --------------------------------------------------------------------------
# Band (epsilon) self-join ----------------------------------------------------
# The third temporal/ordered join shape: |value(a) - value(b)| <= eps.
# Ray Data has no native inequality join, and a hash join cannot express
# it; the classic distributed plan is VALUE-BUCKETIZATION (DeWitt et al.'s
# band join, VLDB 1991): bucket width = eps, every qualifying pair then
# lives either inside one bucket or across two ADJACENT buckets, so each
# row fans out to its own bucket and the one below and every pair is
# evaluated (and counted exactly once) in the bucket of its LOWER member.
# Per-group work is bounded by the value density around that bucket —
# the documented partitioning assumption; a skewed value (one price held
# by millions of rows) would need a salt on the bucket key, exactly like
# agg_skew_salted.
#
# Exactness: prices are compared in integer CENTS (|c_a - c_b| <= eps_c)
# on both sides, so the band boundary cannot flip on a float ulp.

BAND_EPS_CENTS = 20  # +/- 0.20 on p_retailprice


def band_join_parts(sf_dir: str) -> pd.DataFrame:
    """For every part with at least one band-neighbor: (p_partkey, n_band,
    min_neighbor) where neighbors are OTHER parts within ±eps retail
    price. Pairs enumerate once in the lower bucket; per-part tallies then
    merge in one part-keyed groupby of pair-bounded partials."""
    import numpy as np
    from ray.data.aggregate import Min, Sum

    eps = BAND_EPS_CENTS

    def fanout(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = t.column("p_partkey").to_numpy()
        cents = np.asarray(
            pc.cast(pc.round(pc.multiply(t.column("p_retailprice"), 100.0)), pa.int64())
        )
        b = cents // eps
        return pa.table(
            {
                "g": np.concatenate([b, b - 1]),
                "p_partkey": np.concatenate([key, key]),
                "cents": np.concatenate([cents, cents]),
                "b": np.concatenate([b, b]),
            }
        )

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        gid = int(g["g"].iloc[0])
        g = g.sort_values(["cents", "p_partkey"]).reset_index(drop=True)
        cents = g["cents"].to_numpy(np.int64)
        keys = g["p_partkey"].to_numpy(np.int64)
        bs = g["b"].to_numpy(np.int64)
        hi = np.searchsorted(cents, cents + eps, side="right")
        lo = np.arange(len(g)) + 1  # j > i: each unordered pair once
        cnt = np.maximum(hi - lo, 0)
        ii = np.repeat(np.arange(len(g)), cnt)
        jj = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi)]) if cnt.sum() else np.empty(0, np.int64)
        # pair belongs to THIS group iff its lower bucket is gid
        keep = np.minimum(bs[ii], bs[jj]) == gid
        ii, jj = ii[keep], jj[keep]
        ks = np.concatenate([keys[ii], keys[jj]])
        ns = np.concatenate([keys[jj], keys[ii]])
        out = pd.DataFrame({"p_partkey": ks, "neighbor": ns})
        if len(out) == 0:
            return pd.DataFrame(
                {"p_partkey": pd.Series([], dtype="int64"),
                 "n_part": pd.Series([], dtype="int64"),
                 "min_part": pd.Series([], dtype="int64")}
            )
        agg = out.groupby("p_partkey", as_index=False).agg(
            n_part=("neighbor", "size"), min_part=("neighbor", "min")
        )
        return agg.astype({"p_partkey": "int64", "n_part": "int64", "min_part": "int64"})

    out = (
        read_parquet_clean(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_retailprice"]
        )
        .map_batches(fanout, batch_format="pyarrow")
        .groupby("g")
        .map_groups(per_group, batch_format="pandas")
        .groupby("p_partkey")
        .aggregate(Sum("n_part", alias_name="n_band"), Min("min_part", alias_name="min_neighbor"))
        .to_pandas()
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    return out.astype({"p_partkey": "int64", "n_band": "int64", "min_neighbor": "int64"})


BAND_JOIN_PARTS_SQL = f"""
WITH pr AS (
  SELECT p_partkey, CAST(ROUND(p_retailprice * 100.0) AS BIGINT) AS cents
  FROM part
),
pairs AS (
  SELECT a.p_partkey AS k1, b.p_partkey AS k2
  FROM pr a JOIN pr b
    ON a.p_partkey <> b.p_partkey
   AND abs(a.cents - b.cents) <= {BAND_EPS_CENTS}
)
SELECT k1 AS p_partkey, COUNT(*)::BIGINT AS n_band, MIN(k2)::BIGINT AS min_neighbor
FROM pairs GROUP BY k1 ORDER BY p_partkey
"""
