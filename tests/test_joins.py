"""Temporal joins (ops/joins.py): as-of attribution + range-window agg.

Each op is checked against an independent pandas brute-force oracle over
sf0.001 (small enough for O(n^2)) plus a constructed micro-corpus that
pins the edge semantics: strict-before, window edge inclusivity, and the
equal-timestamp tie-break."""

import numpy as np
import pandas as pd
import pytest

from fundamental_ray.ops import joins as J

SF = "/root/testdata/sf0.001"


def _brute_asof(ev: pd.DataFrame) -> pd.DataFrame:
    p = ev[ev.event_type == "purchase"]
    v = ev[ev.event_type == "view"]
    out = []
    for r in p.itertuples():
        c = v[(v.user_id == r.user_id) & (v.ts < r.ts)]
        if len(c):
            c = c.sort_values(["ts", "event_id"]).iloc[-1]
            out.append((r.event_id, r.user_id, r.ts, c.event_id, c.ts))
        else:
            out.append((r.event_id, r.user_id, r.ts, None, None))
    df = pd.DataFrame(out, columns=["event_id", "user_id", "ts", "view_event_id", "view_ts"])
    df["view_event_id"] = df["view_event_id"].astype("Int64")
    return df


def test_asof_prior_view_matches_brute(ray_session):
    got = J.asof_prior_view(SF).sort_values("event_id").reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    exp = _brute_asof(ev).sort_values("event_id").reset_index(drop=True)
    exp["ts"] = exp["ts"].astype("datetime64[us]")
    exp["view_ts"] = pd.to_datetime(exp["view_ts"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_range_click_window_matches_brute(ray_session):
    got = J.range_click_window(SF).sort_values("event_id").reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    s = ev[ev.event_type == "signup"]
    c = ev[ev.event_type == "click"]
    n, vs = [], []
    for r in s.itertuples():
        w = c[(c.user_id == r.user_id) & (c.ts >= r.ts)
              & (c.ts < r.ts + pd.Timedelta(hours=J.RANGE_WINDOW_HOURS))]
        n.append(len(w))
        vs.append(w.value.sum())
    exp = s[["event_id", "user_id", "ts"]].copy()
    exp["n_clicks_6h"] = np.array(n, dtype="int64")
    exp["click_value_6h"] = np.round(np.array(vs), 6)
    exp = exp.sort_values("event_id").reset_index(drop=True)
    exp["ts"] = exp["ts"].astype("datetime64[us]")
    assert (got["n_clicks_6h"] == exp["n_clicks_6h"]).all()
    assert np.allclose(got["click_value_6h"], exp["click_value_6h"], atol=1e-6)
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "ts"]], exp[["event_id", "user_id", "ts"]],
        check_dtype=False,
    )


@pytest.fixture()
def micro_events(tmp_path):
    t0 = pd.Timestamp("2024-01-01")

    def row(eid, ty, user, minutes, value=1.0):
        return dict(event_id=eid, ts=t0 + pd.Timedelta(minutes=minutes),
                    user_id=user, event_type=ty, value=value, props="{}")

    rows = [
        # user 1: views at 0 and 10 (10 duplicated ts via eid 4), purchase at 10
        row(1, "view", 1, 0),
        row(2, "view", 1, 10),
        row(4, "view", 1, 10),          # equal-ts tie: larger eid wins over eid 2
        row(3, "purchase", 1, 10),      # view at ts==10 is NOT prior (strict <)
        row(5, "purchase", 1, 11),      # tie-break: view_event_id == 4
        # user 2: purchase with no prior view
        row(6, "purchase", 2, 5),
        # range-window edges for user 3: signup at 60; clicks at 59 (out),
        # 60 (in: >= start), 60+6h-1us would be in, 60+6h (out: < end)
        row(7, "signup", 3, 60),
        row(8, "click", 3, 59, 2.0),
        row(9, "click", 3, 60, 3.0),
        row(10, "click", 3, 60 + 6 * 60, 5.0),
    ]
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    d = tmp_path / "micro"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    return str(d)


def test_asof_strict_before_and_tiebreak(ray_session, micro_events):
    got = J.asof_prior_view(micro_events).set_index("event_id")
    assert got.loc[3, "view_event_id"] == 1          # ts==10 views excluded
    assert got.loc[5, "view_event_id"] == 4          # equal-ts tie -> max eid
    assert pd.isna(got.loc[6, "view_event_id"])      # no prior view -> null


def test_range_window_edges(ray_session, micro_events):
    got = J.range_click_window(micro_events).set_index("event_id")
    assert got.loc[7, "n_clicks_6h"] == 1            # only the ts==start click
    assert got.loc[7, "click_value_6h"] == 3.0


def test_band_join_parts_brute(ray_session):
    """Band self-join vs an O(n^2) integer-cents brute force at sf0.001,
    plus the symmetry contract (every pair contributes to both endpoints:
    total n_band is even and equals 2x the unordered pair count)."""
    import pyarrow.parquet as pq

    got = J.band_join_parts(SF)
    t = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey", "p_retailprice"])
    keys = t.column("p_partkey").to_numpy()
    cents = np.round(t.column("p_retailprice").to_numpy() * 100.0).astype(np.int64)
    rows = {}
    for i in range(len(keys)):
        d = np.abs(cents - cents[i]) <= J.BAND_EPS_CENTS
        d[i] = False
        nb = keys[d]
        if len(nb):
            rows[int(keys[i])] = (len(nb), int(nb.min()))
    want = pd.DataFrame(
        [(k, n, mn) for k, (n, mn) in sorted(rows.items())],
        columns=["p_partkey", "n_band", "min_neighbor"],
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_dtype=False
    )
    assert got["n_band"].sum() % 2 == 0
