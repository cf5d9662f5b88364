"""NTILE ranking window (pipelines/analytics.py::window_ntile_orders):
quartile sizes follow the SQL rule (first n%k buckets get the extra row),
ordering is deterministic via the orderkey tie-break."""

import pandas as pd

from fundamental_ray.pipelines import analytics as A

SF = "/root/testdata/sf0.001"


def test_ntile_matches_rank_rule(ray_session):
    got = A.window_ntile_orders(SF)
    orders = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    for prio, g in orders.groupby("o_orderpriority"):
        g = g.sort_values(["o_totalprice", "o_orderkey"]).reset_index(drop=True)
        n, k = len(g), 4
        sizes = [n // k + (i < n % k) for i in range(k)]
        exp = []
        for b, s in enumerate(sizes, start=1):
            exp += [b] * s
        sub = got[got.o_orderpriority == prio].set_index("o_orderkey")
        assert sub.loc[g.o_orderkey, "quartile"].tolist() == exp
    assert len(got) == len(orders)
