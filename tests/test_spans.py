"""Duplicated-substring spans, source-level quality gate, temperature mix
(ops/spans.py): oracle parity at sf0.001 (the registry sweep re-checks at
sf0.01) plus the semantic invariants the SQL can't see — maximal-run
structure of spans, symmetry of duplication (every span's windows occur
elsewhere too), gate cardinality, and mix-plan arithmetic."""

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


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)


def test_dedup_substring_spans_oracle(ray_session, duck):
    from fundamental_ray.ops import spans as S

    got = S.dedup_substring_spans(SF)
    want = duck.sql(S.DEDUP_SUBSTRING_SPANS_SQL).df()
    a, b = _sorted(got), _sorted(want)
    assert len(a) == len(b) > 0
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_spans_are_maximal_runs(ray_session):
    from fundamental_ray.ops import spans as S

    got = S.dedup_substring_spans(SF)
    # spans are K-or-longer, window count matches the token extent, and
    # per-doc spans never touch (a touching pair would be ONE maximal run)
    assert (got["span_end"] - got["span_start"] + 1 >= S.SPAN_K).all()
    assert (
        got["n_windows"] == got["span_end"] - got["span_start"] - S.SPAN_K + 2
    ).all()
    for _, g in got.groupby("doc_id"):
        g = g.sort_values("span_start")
        starts = g["span_start"].to_numpy()[1:]
        prev_last_window = (g["span_end"] - S.SPAN_K + 1).to_numpy()[:-1]
        assert (starts > prev_last_window + 1).all()


def test_spans_duplication_is_symmetric(ray_session, duck):
    """Every duplicated window text occurs at >=2 (doc,pos) sites — so the
    total duplicated-window mass (sum of n_windows) can never be 1 for any
    gram, and exact-duplicate docs must carry whole-doc spans."""
    from fundamental_ray.ops import spans as S

    got = S.dedup_substring_spans(SF)
    dup_docs = duck.sql(
        "SELECT doc_id FROM documents WHERE text IN "
        "(SELECT text FROM documents GROUP BY text HAVING COUNT(*) > 1)"
    ).df()["doc_id"]
    covered = set(got["doc_id"])
    assert set(dup_docs) <= covered
    full = got.merge(
        duck.sql(
            "SELECT doc_id, len(string_split(text,' ')) AS n_toks FROM documents"
        ).df(),
        on="doc_id",
    )
    whole = full[full["doc_id"].isin(set(dup_docs))]
    per_doc = whole.groupby("doc_id").agg(
        lo=("span_start", "min"), hi=("span_end", "max"), toks=("n_toks", "first")
    )
    assert (per_doc["lo"] == 0).all()
    assert (per_doc["hi"] == per_doc["toks"] - 1).all()


def test_source_quality_filter_oracle(ray_session, duck):
    from fundamental_ray.ops import spans as S

    got = S.source_quality_filter(SF)
    want = duck.sql(S.SOURCE_QUALITY_FILTER_SQL).df()
    a, b = _sorted(got), _sorted(want)
    assert a.equals(b.astype(a.dtypes.to_dict()))
    # median gate keeps at least half the sources, never all-or-nothing
    # degenerately (the synthetic corpus has spread)
    k = got["kept"].sum()
    assert len(got) / 2 <= k < len(got)


def test_dedup_cdc_chunks_oracle(ray_session, duck):
    from fundamental_ray.ops import spans as S

    got = S.dedup_cdc_chunks(SF)
    want = duck.sql(S.DEDUP_CDC_CHUNKS_SQL).df()
    a, b = _sorted(got), _sorted(want)
    assert len(a) == len(b) > 0
    assert a.equals(b.astype(a.dtypes.to_dict()))
    # occurrence mass always >= doc spread; duplicated means >= 2
    assert (got["n_occ"] >= got["n_docs"]).all()
    assert (got["n_occ"] >= 2).all()


def test_cdc_resynchronizes_after_insertion():
    """The CDC property fixed-width chunking lacks: prepending one word
    changes only chunks up to the first boundary — the tail chunk stream
    is identical, so dedup still matches the unmodified copy's tail."""
    from fundamental_ray.ops import spans as S

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 20
    a = S._cdc_chunks(base.strip())
    b = S._cdc_chunks(("INSERTED " + base).strip())
    # all but the first chunk of the longer stream realign exactly
    assert a[1:] == b[2:] or a == b[1:] or a[1:] == b[1:][1:] or set(a[1:]) <= set(b)
    # stronger: suffix streams coincide from the first shared boundary on
    i = next(k for k, ch in enumerate(b) if ch in set(a))
    j = a.index(b[i])
    assert a[j:] == b[i:]


def test_shuffle_ranks_oracle(ray_session, duck):
    from fundamental_ray.ops import spans as S

    got = S.shuffle_ranks(SF)
    want = duck.sql(S.SHUFFLE_RANKS_SQL).df()
    a, b = _sorted(got), _sorted(want)
    assert a.equals(b.astype(a.dtypes.to_dict()))
    # dense permutation: ranks are exactly 0..n-1, every doc appears once
    n = len(got)
    assert sorted(got["shuffle_rank"]) == list(range(n))
    assert got["doc_id"].is_unique


def test_temperature_mix_oracle(ray_session, duck):
    from fundamental_ray.ops import spans as S

    got = S.temperature_mix(SF)
    want = duck.sql(S.TEMPERATURE_MIX_SQL).df()
    a, b = _sorted(got), _sorted(want)
    assert a.equals(b.astype(a.dtypes.to_dict()))
    assert abs(got["share"].sum() - 1.0) < 1e-4
    # temperature flattens: the rarest lang's share exceeds its raw share,
    # the most common lang's share is below its raw share
    raw = got["n_docs"] / got["n_docs"].sum()
    i_min, i_max = raw.idxmin(), raw.idxmax()
    assert got.loc[i_min, "share"] > raw[i_min]
    assert got.loc[i_max, "share"] < raw[i_max]
