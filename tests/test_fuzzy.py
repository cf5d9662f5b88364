"""Fuzzy vocabulary join (ops/fuzzy.py): oracle parity at sf0.001 plus the
FastSS blocking-recall theorem and DP-vs-DuckDB levenshtein agreement on
crafted strings."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_fuzzy_term_pairs_oracle(ray_session):
    from fundamental_ray.ops import fuzzy as F

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    got = F.fuzzy_term_pairs(SF)
    want = con.sql(F.FUZZY_TERM_PAIRS_SQL).df()
    assert len(got) == len(want) > 0
    assert got.reset_index(drop=True).astype(str).equals(
        want.reset_index(drop=True).astype(str)
    )
    assert (got["dist"] <= F.FUZZY_K).all()
    assert (got["term_a"] < got["term_b"]).all()


def test_fastss_blocking_recall():
    """ed(x, y) <= k  =>  the k-deletion neighborhoods intersect — checked
    exhaustively over a small alphabet so a blocking bug can't hide."""
    from itertools import product

    from fundamental_ray.ops import fuzzy as F

    words = ["".join(p) for n in (1, 2, 3) for p in product("abc", repeat=n)]
    for x in words:
        for y in words:
            d = F._levenshtein(x, y)
            if d <= F.FUZZY_K:
                assert F._del_variants(x) & F._del_variants(y), (x, y, d)


@pytest.mark.parametrize(
    "a,b",
    [("spark", "spork"), ("agg", "big"), ("", "abc"), ("kitten", "sitting"),
     ("flaw", "lawn"), ("abc", "abc")],
)
def test_levenshtein_matches_duckdb(a, b):
    from fundamental_ray.ops import fuzzy as F

    want = duckdb.sql(f"SELECT levenshtein('{a}', '{b}')").fetchone()[0]
    assert F._levenshtein(a, b) == want


def test_random_projection_oracle_and_jl_property(ray_session):
    """JL projection: oracle parity at sf0.001 plus the point of the op —
    pairwise distances are approximately preserved (median distortion of
    projected vs original squared distances within the JL band for k=8)."""
    import numpy as np
    import pyarrow.parquet as pq

    from fundamental_ray.ops import fuzzy as F

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    got = F.random_projection(SF)
    want = con.sql(F.RANDOM_PROJECTION_SQL).df()
    assert got.reset_index(drop=True).astype(str).equals(
        want.reset_index(drop=True).astype(str)
    )
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().sort_values("vec_id")
    X = np.stack(t["embedding"].to_numpy()).astype(np.float64)[:100]
    Y = got.sort_values("vec_id").iloc[:100, 1:].to_numpy(np.float64)
    dx = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    dy = ((Y[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
    iu = np.triu_indices(100, 1)
    ratio = dy[iu] / np.clip(dx[iu], 1e-12, None)
    assert 0.5 < np.median(ratio) < 2.0  # unbiased up to JL variance at k=8
