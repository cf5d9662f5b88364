"""Pivot/crosstab (pipelines/analytics.py::events_pivot_dow): event counts
by day-of-week x type, checked against pandas crosstab over sf0.001 —
including the pyarrow(0=Monday) -> SQL dayofweek(0=Sunday) offset."""

import pandas as pd

from fundamental_ray.pipelines import analytics as A

SF = "/root/testdata/sf0.001"


def test_pivot_matches_crosstab(ray_session):
    got = A.events_pivot_dow(SF).sort_values("dow").reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type"])
    # pandas dayofweek: 0=Monday; SQL dayofweek: 0=Sunday
    dow = (ev["ts"].dt.dayofweek + 1) % 7
    ct = pd.crosstab(dow, ev["event_type"])
    exp = pd.DataFrame(
        {
            "dow": ct.index.to_numpy(dtype="int64"),
            **{f"n_{t}": ct[t].to_numpy(dtype="int64") for t in A.PIVOT_TYPES},
        }
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["dow"].tolist() == list(range(7))  # every weekday present
