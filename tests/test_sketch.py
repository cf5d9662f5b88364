"""Sketch ops (ops/sketch.py): sparse-exact/dense-HLL distinct counting and
the bloom-prefiltered semi-join.

The sketch units are checked without Ray (exactness in sparse mode, dense
accuracy, merge-order independence across the sparse->dense conversion,
serialize round-trip, bloom no-false-negatives). The two registered queries
are checked end-to-end against pandas ground truth over sf0.001."""

import numpy as np
import pandas as pd

from fundamental_ray.ops import sketch as S

SF = "/root/testdata/sf0.001"


def test_sparse_is_exact():
    rng = np.random.default_rng(11)
    v = rng.integers(-(2**62), 2**62, S.SPARSE_THRESHOLD, dtype=np.int64)
    sk = S.DistinctSketch.from_values(np.concatenate([v, v]))  # dup fold
    assert sk.registers is None  # still sparse at exactly the threshold
    assert sk.estimate() == len(np.unique(v))


def test_dense_estimate_within_pct():
    rng = np.random.default_rng(12)
    v = rng.integers(-(2**62), 2**62, 80_000, dtype=np.int64)
    sk = S.DistinctSketch.from_values(v)
    assert sk.registers is not None
    n = len(np.unique(v))
    assert abs(sk.estimate() - n) / n < 0.05  # p=14 std err ~0.8 %


def test_merge_order_independent_across_conversion():
    rng = np.random.default_rng(13)
    v = rng.integers(-(2**62), 2**62, 60_000, dtype=np.int64)
    whole = S.DistinctSketch.from_values(v)
    a = S.DistinctSketch.from_values(v[:10_000])   # sparse at build
    b = S.DistinctSketch.from_values(v[10_000:])   # dense at build
    a.merge(b)
    c = S.DistinctSketch.from_values(v[10_000:])
    c.merge(S.DistinctSketch.from_values(v[:10_000]))
    assert np.array_equal(a.registers, whole.registers)
    assert np.array_equal(c.registers, whole.registers)


def test_serialize_roundtrip_both_modes():
    rng = np.random.default_rng(14)
    for n in (100, 50_000):
        sk = S.DistinctSketch.from_values(
            rng.integers(0, 2**62, n, dtype=np.int64)
        )
        mode, payload = sk.serialize()
        back = S.DistinctSketch.deserialize(mode, payload)
        assert back.estimate() == sk.estimate()


def test_quantile_sketch_exact_mode_equals_percentile():
    rng = np.random.default_rng(3)
    v = rng.lognormal(10, 1, 30_000)
    sk = S.QuantileSketch.from_values(v[:12_000])
    sk.merge(S.QuantileSketch.from_values(v[12_000:]))
    assert sk.exact
    for q in (0.5, 0.9, 0.99):
        assert sk.quantile(q) == np.percentile(v, q * 100, method="linear")


def test_quantile_sketch_compressed_rank_error():
    rng = np.random.default_rng(4)
    big = rng.lognormal(10, 1, 500_000)
    sk = S.QuantileSketch()
    for i in range(0, len(big), 50_000):
        sk.merge(S.QuantileSketch.from_values(big[i : i + 50_000]))
    assert not sk.exact and len(sk.vals) <= S.QUANTILE_CAP
    sv = np.sort(big)
    for q in (0.1, 0.5, 0.9, 0.99):
        rank = np.searchsorted(sv, sk.quantile(q)) / len(sv)
        assert abs(rank - q) < 0.005


def test_sketch_quantiles_price_matches_pandas(ray_session):
    from fundamental_ray.pipelines.analytics import r2

    got = (
        S.sketch_quantiles_price(SF)
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    )
    rows = []
    for f, g in li.groupby("l_returnflag"):
        v = g["l_extendedprice"].to_numpy()
        rows.append(
            {
                "l_returnflag": f,
                **{
                    f"p{int(q*100)}": float(
                        r2(np.percentile(v, q * 100, method="linear"))
                    )
                    for q in (0.5, 0.9, 0.99)
                },
            }
        )
    exp = pd.DataFrame(rows).sort_values("l_returnflag").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_bloom_no_false_negatives_low_fp():
    rng = np.random.default_rng(15)
    keys = rng.integers(0, 10**12, 20_000, dtype=np.int64)
    bits = S.build_bloom(keys)
    assert S.bloom_contains(bits, keys).all()
    other = rng.integers(10**13, 10**14, 100_000, dtype=np.int64)
    assert S.bloom_contains(bits, other).mean() < 0.03


def test_distinct_users_daily_exact_at_sf(ray_session):
    got = (
        S.distinct_users_daily(SF)
        .sort_values("day")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "user_id"])
    exp = (
        ev.assign(day=ev["ts"].dt.strftime("%Y-%m-%d"))
        .groupby("day")["user_id"]
        .nunique()
        .rename("n_users")
        .reset_index()
        .sort_values("day")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_bloom_semi_join_matches_pandas(ray_session):
    got = (
        S.bloom_semi_join_urgent(SF)
        .sort_values(["l_orderkey", "l_partkey", "l_quantity"])
        .reset_index(drop=True)
    )
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    urgent = set(orders.loc[orders.o_orderpriority == "1-URGENT", "o_orderkey"])
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"],
    )
    exp = (
        li[li.l_orderkey.isin(urgent)]
        .sort_values(["l_orderkey", "l_partkey", "l_quantity"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_hll_users_daily_estimate_quality(ray_session):
    """Dense-HLL register math vs the exact daily distincts: at p=10 the
    linear-counting regime should land within a few percent, and the
    register occupancy must be consistent (n_hit + zeros = m)."""
    import duckdb

    from fundamental_ray.ops.sketch import HLL_M, hll_users_daily

    sf = "/root/testdata/sf0.001"
    got = hll_users_daily(sf)
    assert (got["n_hit"] + got["zeros"] == HLL_M).all()
    exact = duckdb.sql(
        f"""SELECT strftime(ts, '%Y-%m-%d') AS day,
                   COUNT(DISTINCT user_id)::BIGINT AS n
            FROM '{sf}/events.parquet' GROUP BY 1"""
    ).df().set_index("day")["n"]
    merged = got.set_index("day").join(exact)
    rel = (merged["hll_estimate"] - merged["n"]).abs() / merged["n"]
    assert (rel < 0.12).all(), merged  # p=10 ⇒ ~3.2% σ; 12% is ~4σ


def test_cusum_alarms_match_scalar_fold(ray_session):
    """Bucketized distributed CUSUM vs a plain per-user scalar fold."""
    import pandas as pd

    from fundamental_ray.pipelines.relational import (
        CUSUM_H, CUSUM_SLACK, CUSUM_TARGET, events_cusum_alarms,
    )

    sf = "/root/testdata/sf0.001"
    got = events_cusum_alarms(sf)
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    ).sort_values(["user_id", "ts", "event_id"])
    for uid, per in list(ev.groupby("user_id"))[:50]:
        s, alarms = 0.0, 0
        for v in per["value"]:
            s = max(0.0, s + float(v) - (CUSUM_TARGET + CUSUM_SLACK))
            if s > CUSUM_H:
                alarms += 1
                s = 0.0
        row = got[got["user_id"] == uid].iloc[0]
        assert row["n_alarms"] == alarms
        assert abs(row["final_cusum"] - round(s, 6)) < 1e-9
    assert got["n_alarms"].sum() > 0  # the detector actually fires
