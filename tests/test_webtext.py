"""Round-4 web-text operators: split/PII/MAD/compressibility/range-search.

Oracle parity at sf0.001 for the SQL-backed ops (the registry sweep covers
sf0.01); the PII hit path — absent from the synthetic corpus — is
cross-checked against DuckDB's RE2 on crafted strings so the Python-re vs
RE2 semantics claim in ops/webtext.py is pinned, not assumed.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("documents", "events", "embeddings")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
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


def test_split_train_holdout_oracle(ray_session, duck):
    from fundamental_ray.ops import webtext as W

    got = W.split_train_holdout(SF)
    want = duck.sql(W.SPLIT_TRAIN_HOLDOUT_SQL).df()
    _cmp(got, want)
    # partition property: tallies cover the whole table exactly once
    n, chars = duck.sql("SELECT COUNT(*), SUM(n_chars) FROM documents").fetchone()
    assert got["n_docs"].sum() == n
    assert got["total_chars"].sum() == chars
    assert set(got["split"]) <= {"train", "valid", "test"}


def test_pii_scrub_oracle_corpus(ray_session, duck):
    from fundamental_ray.ops import webtext as W

    got = W.pii_scrub(SF)
    want = duck.sql(W.PII_SCRUB_SQL).df()
    _cmp(got, want)


def test_pii_scrub_hit_path_matches_duckdb():
    """Python re vs DuckDB RE2 on strings that DO contain emails/IPv4 —
    counts and the redacted text itself must agree byte-for-byte."""
    import hashlib
    import re

    from fundamental_ray.ops import webtext as W

    cases = [
        "contact bob.smith+spam@ex-ample.co.uk or 10.0.255.3 now",
        "two mails a@b.io c.d@e.org one ip 192.168.1.1.",
        "no pii here, just 1.2 version and a@ nothing",
        "edge 999.999.999.999 and x@y.zz trailing",
        "",
    ]
    con = duckdb.connect()
    for s in cases:
        n_em = len(re.findall(W.EMAIL_PAT, s))
        n_ip = len(re.findall(W.IPV4_PAT, s))
        red = re.sub(W.IPV4_PAT, "<IP>", re.sub(W.EMAIL_PAT, "<EMAIL>", s))
        row = con.execute(
            f"""SELECT len(regexp_extract_all(?, '{W.EMAIL_PAT}')),
                       len(regexp_extract_all(?, '{W.IPV4_PAT}')),
                       regexp_replace(regexp_replace(?, '{W.EMAIL_PAT}', '<EMAIL>', 'g'),
                                      '{W.IPV4_PAT}', '<IP>', 'g')""",
            [s, s, s],
        ).fetchone()
        assert (n_em, n_ip, red) == row, s
        assert hashlib.md5(red.encode()).hexdigest() == hashlib.md5(row[2].encode()).hexdigest()


def test_events_anomaly_mad_oracle(ray_session, duck):
    from fundamental_ray.ops import webtext as W

    got = W.events_anomaly_mad(SF)
    want = duck.sql(W.EVENTS_ANOMALY_MAD_SQL).df()
    assert len(got) > 0  # the op actually flags something at this scale
    _cmp(got, want, float_cols=("deviation",))


def test_compression_topk_invariants(ray_session):
    from fundamental_ray.ops import webtext as W

    a = W.compression_ratio_topk(SF)
    b = W.compression_ratio_topk(SF)
    pd.testing.assert_frame_equal(a, b)  # deterministic
    assert len(a) == W.COMP_TOPK
    assert (a["ratio_bp"] > 0).all()
    assert a["ratio_bp"].is_monotonic_increasing
    # the reported top-k really is the global minimum set: no document
    # outside the result compresses better than the worst kept row
    import zlib

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    kept = set(a["doc_id"])
    worst = a["ratio_bp"].max()
    for _, r in docs.iterrows():
        raw = (r["text"] or "").encode()
        bp = 10_000 * len(zlib.compress(raw, W.COMP_LEVEL)) // len(raw) if raw else 10_000
        if r["doc_id"] not in kept:
            assert bp >= worst


def test_ann_range_search_oracle(ray_session, duck):
    from fundamental_ray.ops import ann as N

    got = N.range_search(SF)
    want = duck.sql(N.RANGE_SEARCH_SQL).df()
    assert len(got) > 0
    _cmp(got, want, float_cols=("cosine",))


def test_pmi_bigrams_oracle(ray_session, duck):
    from fundamental_ray.ops import webtext as W

    got = W.pmi_bigrams(SF)
    want = duck.sql(W.PMI_BIGRAMS_SQL).df()
    assert len(got) == W.PMI_TOPK  # the cut is real at this scale
    _cmp(got, want, float_cols=("pmi",))
    # ranking invariant: pmi non-increasing, every pair above the count bar
    assert got["pmi"].is_monotonic_decreasing or (
        got["pmi"].diff().dropna() <= 1e-12
    ).all()
    assert (got["cnt"] >= W.PMI_MIN_COUNT).all()


def test_events_watermark_late_oracle(ray_session, duck):
    from fundamental_ray.ops import webtext as W

    got = W.events_watermark_late(SF)
    want = duck.sql(W.EVENTS_WATERMARK_LATE_SQL).df()
    assert len(got) > 0  # jitter >> min inter-event gap: late events exist
    _cmp(got, want)
    # every reported event is genuinely late: its own ts is under the
    # watermark in force at its arrival
    assert (got["ts_us"] < got["wm_us"]).all()
    # watermark is monotone in arrival order (max-minus-constant of a
    # growing set) over the late subsequence
    assert got["wm_us"].is_monotonic_increasing


def test_stratified_sample_oracle(ray_session, duck):
    from fundamental_ray.ops import webtext as W

    got = W.stratified_sample(SF)
    want = duck.sql(W.STRATIFIED_SAMPLE_SQL).df()
    assert len(got) > 0
    _cmp(got, want)
    # exact quota per stratum (or the whole stratum if smaller)
    sizes = duck.sql("SELECT lang, COUNT(*) n FROM documents GROUP BY lang").df()
    for lang, n in zip(sizes["lang"], sizes["n"]):
        assert (got["lang"] == lang).sum() == min(int(n), W.STRAT_N)
    # determinism: re-running returns the identical sample
    pd.testing.assert_frame_equal(got, W.stratified_sample(SF))


def test_bigram_perplexity_oracle(ray_session, duck):
    from fundamental_ray.ops import webtext as W

    got = W.bigram_perplexity(SF)
    want = duck.sql(W.BIGRAM_PERPLEXITY_SQL).df()
    assert len(got) > 0
    _cmp(got, want, float_cols=("ppl",))
    assert (got["ppl"] > 1.0).all()  # a smoothed LM is never certain


def test_source_mixture_oracle(ray_session, duck):
    from fundamental_ray.ops import webtext as W

    got = W.source_mixture(SF)
    want = duck.sql(W.SOURCE_MIXTURE_SQL).df()
    assert len(got) > 1
    _cmp(got, want, float_cols=("p", "weight"))
    # temperature flattening: weights sum to 1 and the spread is strictly
    # narrower than the raw shares' spread (α < 1 compresses)
    assert abs(got["weight"].sum() - 1.0) < 1e-6
    assert got["weight"].max() - got["weight"].min() <= got["p"].max() - got["p"].min()


def test_watermark_bucket_span_invariance(ray_session, monkeypatch):
    """The late-event set is a pure function of the stream, not of the
    bucket decomposition: halving the arrival-bucket span must reproduce
    the identical result (the pack.py scan-correctness property)."""
    from fundamental_ray.ops import webtext as W

    base = W.events_watermark_late(SF)
    monkeypatch.setattr(W, "WM_BUCKET_SPAN_US", W.WM_BUCKET_SPAN_US // 4)
    narrow = W.events_watermark_late(SF)
    pd.testing.assert_frame_equal(base, narrow)


def test_pps_sample_oracle(ray_session, duck):
    from fundamental_ray.ops import webtext as W

    got = W.pps_sample(SF)
    want = duck.sql(W.PPS_SAMPLE_SQL).df()
    n_docs = duck.sql("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert 0 < len(got) < n_docs  # the predicate discriminates
    _cmp(got, want, float_cols=("weight",))
    # Horvitz-Thompson: weights >= 1, larger docs get smaller weights
    assert (got["weight"] >= 1.0).all()
    two = got.drop_duplicates("n_chars").sort_values("n_chars")
    assert two["weight"].is_monotonic_decreasing


def test_flesch_by_source_oracle(ray_session, duck):
    from fundamental_ray.ops import webtext as W

    got = W.flesch_by_source(SF)
    want = duck.sql(W.FLESCH_BY_SOURCE_SQL).df()
    _cmp(got, want, float_cols=("flesch",))
    # integer totals are internally consistent: every doc has >= 1 sentence
    assert (got["sentences"] >= got["n_docs"]).all()
    assert (got["syllables"] <= got["words"] * 10).all()  # sanity bound


def test_feature_hashing_oracle_and_mass(ray_session, duck):
    """Hashing trick: oracle parity (all-integer, no rounding contract)
    plus mass conservation — sum of |bucket| counts <= n_tokens with
    equality iff no in-doc sign cancellation, and the signed total equals
    the sum of per-token signs."""
    from fundamental_ray.ops import webtext as W

    got = W.feature_hashing(SF)
    want = duck.sql(W.FEATURE_HASHING_SQL).df()
    _cmp(got, want)
    f = got[[c for c in got.columns if c.startswith("f")]]
    assert (f.abs().sum(axis=1) <= got["n_tokens"]).all()
    assert (f.abs().sum(axis=1) % 2 == got["n_tokens"] % 2).all()  # parity
