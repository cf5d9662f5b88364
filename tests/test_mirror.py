"""Mirror detection + boilerplate inventory: oracle parity at sf0.001
(the registry sweep covers sf0.01) and the contract invariants."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return con


def _cmp(got: pd.DataFrame, want: pd.DataFrame, float_cols=()):
    assert len(got) == len(want)
    assert sorted(got.columns) == sorted(want.columns)
    got = got[sorted(got.columns)].reset_index(drop=True)
    want = want[sorted(want.columns)].reset_index(drop=True)
    for c in got.columns:
        if c in float_cols:
            pd.testing.assert_series_equal(
                got[c].astype("float64"), want[c].astype("float64"),
                check_names=False, rtol=0, atol=1e-9,
            )
        else:
            assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c


def test_mirror_sources_oracle(ray_session, duck):
    from fundamental_ray.ops import mirror as M

    got = M.mirror_sources(SF)
    want = duck.sql(M.MIRROR_SOURCES_SQL).df()
    _cmp(got, want, float_cols=("resemblance",))
    assert len(got) > 0  # synthetic corpus yields qualifying pairs
    # contract: canonical pair order, threshold respected, jaccard in (0, 1]
    assert (got["src_a"] < got["src_b"]).all()
    assert (got["shared_grams"] >= M.MIRROR_MIN_SHARED).all()
    assert ((got["resemblance"] > 0) & (got["resemblance"] <= 1)).all()


def test_boilerplate_grams_oracle(ray_session, duck):
    from fundamental_ray.ops import mirror as M

    got = M.boilerplate_grams(SF)
    want = duck.sql(M.BOILERPLATE_GRAMS_SQL).df()
    _cmp(got, want)
    assert len(got) > 0
    assert (got["df"] >= M.BOILER_MIN_DF).all()
    # df can never exceed the source's document count
    ndocs = dict(
        duck.sql("SELECT source, COUNT(*) FROM documents GROUP BY 1").fetchall()
    )
    assert (got["df"] <= got["source"].map(ndocs)).all()


def test_mirror_gram_semantics_match_sql_split(duck):
    # the Ray side's WORD_RE shingling must equal the oracle's
    # regexp_extract_all + list slicing on a crafted doc
    from fundamental_ray.ops.mirror import MIRROR_K, _grams

    txt = "A b  c\td e f g h"
    want = {
        r[0]
        for r in duck.sql(
            rf"""
            WITH w AS (SELECT regexp_extract_all(lower('{txt}'), '\S+') AS w)
            SELECT DISTINCT unnest(list_transform(
              generate_series(1, len(w) - {MIRROR_K} + 1),
              i -> array_to_string(w[i::INT : i::INT + {MIRROR_K} - 1], ' ')))
            FROM w
            """
        ).fetchall()
    }
    assert _grams(txt, MIRROR_K) == want
