"""Ordered time-bounded funnel (pipelines/analytics.py::events_funnel).

Checked against a pandas brute force over sf0.001 and a constructed
micro-corpus pinning the edge semantics: strictly-after, window-edge
inclusivity (<= first + 6h), and stage chaining off the FIRST qualifying
event (not any later one)."""

import pandas as pd
import pytest

from fundamental_ray.pipelines import analytics as A

SF = "/root/testdata/sf0.001"


def _brute(ev: pd.DataFrame) -> tuple[int, int, int]:
    w = pd.Timedelta(hours=A.FUNNEL_WINDOW_HOURS)
    v = ev[ev.event_type == "view"].groupby("user_id")["ts"].min()
    n_c = {}
    for u, vt in v.items():
        c = ev[
            (ev.user_id == u)
            & (ev.event_type == "click")
            & (ev.ts > vt)
            & (ev.ts <= vt + w)
        ]
        if len(c):
            n_c[u] = c.ts.min()
    n_p = 0
    for u, ct in n_c.items():
        p = ev[
            (ev.user_id == u)
            & (ev.event_type == "purchase")
            & (ev.ts > ct)
            & (ev.ts <= ct + w)
        ]
        n_p += bool(len(p))
    return len(v), len(n_c), n_p


def test_funnel_matches_brute(ray_session):
    got = A.events_funnel(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    exp = _brute(ev)
    assert tuple(got.iloc[0]) == exp
    assert exp[0] > exp[1] >= exp[2]  # the window makes stages discriminate


@pytest.fixture()
def micro(tmp_path):
    t0 = pd.Timestamp("2024-01-01")

    def row(eid, ty, user, minutes):
        return dict(event_id=eid, ts=t0 + pd.Timedelta(minutes=minutes),
                    user_id=user, event_type=ty, value=1.0, props="{}")

    h = 60
    rows = [
        # user 1: full funnel — click exactly AT the 6h edge (inclusive),
        # purchase 1 min after the click
        row(1, "view", 1, 0),
        row(2, "click", 1, 6 * h),
        row(3, "purchase", 1, 6 * h + 1),
        # user 2: click 1 min past the view window -> stops at stage 1
        row(4, "view", 2, 0),
        row(5, "click", 2, 6 * h + 1),
        row(6, "purchase", 2, 6 * h + 2),
        # user 3: click at the same ts as the view (not strictly after)
        row(7, "view", 3, 0),
        row(8, "click", 3, 0),
        # user 4: purchase chains off the FIRST in-window click (at 10),
        # not the later one (at 100); purchase at 10+6h+1 -> out
        row(9, "view", 4, 0),
        row(10, "click", 4, 10),
        row(11, "click", 4, 100),
        row(12, "purchase", 4, 10 + 6 * h + 1),
        # user 5: purchase before the click -> not a conversion
        row(13, "view", 5, 0),
        row(14, "purchase", 5, 5),
        row(15, "click", 5, 10),
    ]
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    d = tmp_path / "micro"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    return str(d)


def test_funnel_edge_semantics(ray_session, micro):
    got = A.events_funnel(micro)
    assert tuple(got.iloc[0]) == (5, 3, 1)
    # 5 viewers; in-window strictly-after clicks: users 1 (at edge), 4, 5;
    # full funnel: only user 1 (user 4's purchase misses the click window,
    # user 5 purchased before clicking)
