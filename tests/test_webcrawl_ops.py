"""SURT keys, boilerplate fraction, mirror collapse, hybrid RRF and label
propagation: oracle parity at sf0.001 (the registry sweep covers sf0.01)
plus each op's contract invariants."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings", "lineitem"):
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


def test_surt_keys_oracle(ray_session, duck):
    from fundamental_ray.crawl import surt as S
    from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

    corpus = materialize_corpus(scale_tag_of(SF))
    got = S.surt_keys(SF)
    want = duck.sql(S.surt_keys_sql(corpus)).df()
    _cmp(got, want)
    assert len(got) > 0
    # contract: no scheme, reversed host before ')', www dropped
    assert not got["surt"].str.contains("://").any()
    assert not got["surt"].str.startswith("www").any()
    www = got[got["url"].str.contains("://www.funda.nl/")]
    if len(www):
        assert www["surt"].str.startswith("nl,funda)").all()


def test_surt_domain_counts_oracle(ray_session, duck):
    from fundamental_ray.crawl import surt as S
    from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

    corpus = materialize_corpus(scale_tag_of(SF))
    got = S.surt_domain_counts(SF)
    want = duck.sql(S.surt_domain_counts_sql(corpus)).df()
    _cmp(got, want)
    assert (got["distinct_paths"] <= got["pages"]).all()


def test_surt_query_param_sorting():
    from fundamental_ray.crawl.surt import _surt_parts

    p = _surt_parts(
        pd.Series(
            [
                "https://www.Funda.nl:443/zoeken/koop/?b=2&a=1",
                "http://x.example/p",
                "https://host.example",  # no path at all
            ]
        )
    )
    surt = (p["surt_host"] + ")" + p["path"] + p["sq"]).tolist()
    assert surt[0] == "nl,funda)/zoeken/koop/?a=1&b=2"
    assert surt[1] == "example,x)/p"
    assert surt[2] == "example,host)/"


def test_boilerplate_fraction_oracle(ray_session, duck):
    from fundamental_ray.ops import mirror as M

    got = M.boilerplate_fraction(SF)
    want = duck.sql(M.BOILERPLATE_FRACTION_SQL).df()
    _cmp(got, want, float_cols=("boiler_frac",))
    assert len(got) > 0
    assert ((got["boiler_frac"] >= 0) & (got["boiler_frac"] <= 1)).all()
    assert (got["boiler_grams"] <= got["total_grams"]).all()


def test_mirror_collapse_oracle(ray_session, duck):
    from fundamental_ray.ops import mirror as M

    got = M.mirror_collapse(SF)
    want = duck.sql(M.MIRROR_COLLAPSE_SQL).df()
    _cmp(got, want)
    # contract: representatives are kept, every representative is minimal
    # in its component (<= all members), collapse drops at least one host
    # on the synthetic corpus
    reps = got[got["kept"]]
    assert (reps["source"] == reps["representative"]).all()
    assert (got["representative"] <= got["source"]).all()
    assert (~got["kept"]).any()


def test_hybrid_rrf_oracle(ray_session, duck):
    from fundamental_ray.ops import index as IX

    got = IX.hybrid_rrf_topk(SF)
    want = duck.sql(IX.HYBRID_RRF_SQL).df()
    _cmp(got, want, float_cols=("rrf_score", "bm25_rank", "cos_rank"))
    assert list(got["rank"]) == list(range(1, len(got) + 1))
    # rrf monotone non-increasing
    assert (np.diff(got["rrf_score"].to_numpy()) <= 1e-12).all()
    # a doc ranked by both lists must outscore one ranked by a single list
    both = got[got["bm25_rank"].notna() & got["cos_rank"].notna()]
    single = got[got["bm25_rank"].isna() | got["cos_rank"].isna()]
    if len(both) and len(single):
        assert both["rrf_score"].min() > 0


def test_label_propagation_oracle(ray_session, duck):
    from fundamental_ray.ops import graph as G

    got = G.label_propagation(SF)
    want = duck.sql(G.LABEL_PROPAGATION_SQL).df()
    _cmp(got, want)
    # contract: labels are node ids; more than one community survives and
    # at least one merge happened at sf0.001
    assert set(got["label"]).issubset(set(got["node"]))
    assert got["label"].nunique() < len(got)


def test_ccnet_buckets_oracle(ray_session, duck):
    from fundamental_ray.ops import webtext as W

    got = W.ccnet_buckets(SF)
    want = duck.sql(W.CCNET_BUCKETS_SQL).df()
    _cmp(got, want, float_cols=("ppl",))
    # per language the terciles differ by at most one doc
    sizes = got.groupby(["lang", "bucket"]).size().unstack(fill_value=0)
    assert ((sizes.max(axis=1) - sizes.min(axis=1)) <= 1).all()
    # head has the lowest perplexity per language
    for lang, g in got.groupby("lang"):
        assert g.loc[g["bucket"] == "head", "ppl"].max() <= g.loc[
            g["bucket"] == "tail", "ppl"
        ].min() + 1e-9


def test_redirect_resolve_oracle(ray_session, duck):
    from fundamental_ray.crawl import redirects as RED
    from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

    corpus = materialize_corpus(scale_tag_of(SF))
    got = RED.resolve_redirects(SF)
    want = duck.sql(RED.resolve_redirects_sql(corpus)).df()
    _cmp(got, want)
    assert len(got) > 0
    # contract: every resolution terminates at a REAL corpus url (https,
    # no alias host, no tracking param), never at another alias
    assert got["resolved_url"].str.startswith("https://").all()
    assert not got["resolved_url"].str.contains("://m.").any()
    assert not got["resolved_url"].str.contains("utm_source").any()
    # chains: a 3-hop alias resolves through BOTH intermediates, which
    # themselves appear as 2- and 1-hop rows with the same terminal
    h3 = got[got["hops"] == 3]
    assert len(h3) > 0
    merged = h3.merge(got[got["hops"] == 2], on="resolved_url")
    assert len(merged) >= len(h3)
    assert set(got["hops"]) == {1, 2, 3}


def test_anchor_texts_oracle(ray_session, duck):
    from fundamental_ray.crawl import anchors as A
    from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

    corpus = materialize_corpus(scale_tag_of(SF))
    got = A.anchor_texts(SF)
    want = duck.sql(A.anchor_texts_sql(corpus)).df()
    _cmp(got, want)
    assert len(got) > 0
    # contract: detail-page targets carry street-name anchor text; the
    # noise map target aggregates the 'kaart' anchors; next-page targets
    # aggregate 'Volgende'
    detail = got[got["target_url"].str.contains("/detail/koop/")]
    assert len(detail) > 0
    assert (detail["n_links"] >= 1).all()
    nxt = got[got["anchor_texts"] == "Volgende"]
    assert len(nxt) > 0
    maps = got[got["target_url"].str.endswith("/map/")]
    assert len(maps) > 0 and (maps["anchor_texts"] == "kaart").all()
    # every target resolved absolute
    assert got["target_url"].str.startswith("https://").all()


def test_host_graph_oracle(ray_session, duck):
    from fundamental_ray.crawl import anchors as A
    from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

    corpus = materialize_corpus(scale_tag_of(SF))
    got = A.host_graph(SF)
    want = duck.sql(A.host_graph_sql(corpus)).df()
    _cmp(got, want)
    assert len(got) > 0
    # contract: the synthetic corpus links within one host universe —
    # every edge's endpoints are real hosts, and every src host links to
    # at least its own detail pages (self-edge present)
    selfe = got[got["src_host"] == got["tgt_host"]]
    assert len(selfe) > 0
    assert (got["n_links"] >= got["n_src_pages"]).all()


def test_shard_rendezvous_oracle(ray_session, duck):
    from fundamental_ray.crawl import sharding as S
    from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

    corpus = materialize_corpus(scale_tag_of(SF))
    got = S.shard_assignments(SF)
    want = duck.sql(S.shard_assignments_sql(corpus)).df()
    _cmp(got, want)
    assert len(got) > 0
    assert got["shard"].between(0, S.N_SHARDS - 1).all()
    # HRW stability: the assignment is a pure function of (host, K)
    again = S.shard_assignments(SF)
    assert got.equals(again)
    # minimal-disruption property: growing K to K+1 only MOVES hosts into
    # the new shard — no host moves between surviving shards
    k1 = {h: S._hrw_shard(h, S.N_SHARDS + 1) for h in got["host"]}
    moved = {h for h, s in zip(got["host"], got["shard"]) if k1[h] != s}
    assert all(k1[h] == S.N_SHARDS for h in moved)

    load = S.shard_load(SF)
    want_load = duck.sql(S.shard_load_sql(corpus)).df()
    _cmp(load, want_load)
    assert len(load) == S.N_SHARDS
    assert load["n_pages"].sum() == got["n_pages"].sum()


def test_shard_migration_oracle(ray_session, duck):
    from fundamental_ray.crawl import sharding as S
    from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

    corpus = materialize_corpus(scale_tag_of(SF))
    got = S.shard_migration(SF)
    want = duck.sql(S.shard_migration_sql(corpus)).df()
    _cmp(got, want)
    assert len(got) > 0
    assert (got.loc[got["moved"], "shard_k1"] == S.N_SHARDS).all()
    # kernel property over a large synthetic host population (the corpus
    # has only 4 hosts): K->K+1 moves ~1/(K+1) of hosts, ALL into the new
    # shard — the minimal-disruption contract hash%K cannot give
    hosts = [f"host-{i}.example" for i in range(900)]
    k0 = [S._hrw_shard(h, S.N_SHARDS) for h in hosts]
    k1 = [S._hrw_shard(h, S.N_SHARDS + 1) for h in hosts]
    moved = [(a, b) for a, b in zip(k0, k1) if a != b]
    assert all(b == S.N_SHARDS for _, b in moved)
    frac = len(moved) / len(hosts)
    assert 0.05 < frac < 0.20, frac  # ~1/9 expected


def test_wet_extract_oracle(ray_session, duck):
    from fundamental_ray.crawl import wet as W
    from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

    corpus = materialize_corpus(scale_tag_of(SF))
    got = W.wet_extract(SF)
    want = duck.sql(W.wet_extract_sql(corpus)).df()
    _cmp(got, want, float_cols=("text_ratio",))
    assert len(got) > 0
    # contract: no tags or script payloads survive; whitespace collapsed
    assert not got["text"].str.contains("<").any()
    assert not got["text"].str.contains("ld+json", regex=False).any()
    assert not got["text"].str.contains("  ").any()
    # list pages carry street names in visible text; every page accounted
    assert got["text"].str.contains("Koopwoningen").any()
    assert (got["text_bytes"] <= got["html_bytes"]).all()


def test_revisit_records_oracle(ray_session, duck):
    from fundamental_ray.crawl import revisit as R
    from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

    corpus = materialize_corpus(scale_tag_of(SF))
    got = R.revisit_records(SF)
    want = duck.sql(R.revisit_records_sql(corpus)).df()
    _cmp(got, want)
    # WARC 1.1 contract: exactly one response per digest; revisits point
    # at it; the canonical capture is the digest's (warc_ts, url) min
    assert (got.groupby("digest")["record_type"].apply(lambda s: (s == "response").sum()) == 1).all()
    rv = got[got["record_type"] == "revisit"]
    assert len(rv) > 0  # the corpus has mirrored/blank duplicate payloads
    assert rv["refers_to_url"].notna().all() and rv["refers_to_ts"].notna().all()
    resp = got[got["record_type"] == "response"]
    assert resp["refers_to_url"].isna().all()
    joined = rv.merge(resp, left_on="digest", right_on="digest", suffixes=("", "_c"))
    assert (joined["refers_to_url"] == joined["url_c"]).all()
    assert (
        (joined["warc_ts"] > joined["warc_ts_c"])
        | ((joined["warc_ts"] == joined["warc_ts_c"]) & (joined["url"] > joined["url_c"]))
    ).all()


def test_web_corpus_oracle(ray_session, duck):
    from fundamental_ray.crawl import wet as W
    from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

    corpus = materialize_corpus(scale_tag_of(SF))
    got = W.web_corpus(SF)
    want = duck.sql(W.web_corpus_sql(corpus)).df()
    _cmp(got, want)
    assert 0 < len(got)
    # gates actually bit: some pages were dropped (lang/length/dedup)
    full = W.wet_extract(SF)
    assert len(got) < len(full)
    # production contract: nl only, >= 15 words, texts globally unique
    assert (got["lang"] == "nl").all()
    assert (got["n_words"] >= 15).all()
    assert got["text"].is_unique


def test_focused_priorities_oracle(ray_session):
    """Best-first anchor-relevance frontier: oracle parity at sf0.001 plus
    the ordering contract (scores weakly decreasing, ranks 1..k, every
    scheduled target's slug actually contains a topic term)."""
    from fundamental_ray.crawl import anchors as A
    from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

    corpus = materialize_corpus(scale_tag_of(SF))
    got = A.focused_priorities(SF)
    want = duckdb.sql(A.focused_priorities_sql(corpus)).df()
    _cmp(got, want)
    assert len(got) == A.FOCUS_TOPK
    assert (got["score"].to_numpy()[:-1] >= got["score"].to_numpy()[1:]).all()
    assert got["rank"].tolist() == list(range(1, len(got) + 1))
    # anchor texts are street names that also appear in the detail slug
    assert got["target_url"].str.contains("|".join(A.FOCUS_TERMS)).all()


def test_wat_records_oracle(ray_session):
    """WAT metadata sidecar: oracle parity at sf0.001 plus the structural
    contract (internal+external == links; detail pages are leaf nodes,
    list pages fan out)."""
    from fundamental_ray.crawl import wet as W
    from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of

    corpus = materialize_corpus(scale_tag_of(SF))
    got = W.wat_records(SF)
    want = duckdb.sql(W.wat_records_sql(corpus)).df()
    _cmp(got, want)
    assert (got["n_internal"] + got["n_external"] == got["n_links"]).all()
    detail = got[got["url"].str.contains("/detail/")]
    lists = got[got["url"].str.contains("/zoeken/")]
    assert (detail["n_links"] == 0).all()
    assert (lists["n_links"] > 0).all()
    assert (lists["title"].str.len() > 0).all()


def test_nearest_metro_brute_and_contract(ray_session):
    """Nearest-metro assignment vs an independent per-row brute force at
    sf0.001, plus the contract: every geocoded property is assigned, to a
    real metro, with the minimal squared-degree distance."""
    import numpy as np

    from fundamental_ray.ops.geometry import metro_centers
    from fundamental_ray.pipelines.crawl_run import (
        crawl_geocoded,
        crawl_listings,
        crawl_nearest_metro,
    )

    got = crawl_nearest_metro(SF)
    geo = crawl_geocoded(SF)
    geo = geo[geo["latitude"].notna()].reset_index(drop=True)
    centers = metro_centers(crawl_listings(SF).to_pandas())
    assert len(got) == len(geo)
    assert set(got["nearest_city"]) <= set(centers["city"])
    byurl = got.set_index("url")
    cl = centers.set_index("city")
    for _, r in geo.sample(50, random_state=7).iterrows():
        d2 = (
            (r["latitude"] - cl["center_lat"]) ** 2
            + (r["longitude"] - cl["center_lng"]) ** 2
        )
        want_city = d2.sort_index().idxmin()
        row = byurl.loc[r["url"]]
        assert row["nearest_city"] == want_city, r["url"]
        assert abs(row["dist2"] - d2.min()) < 2e-6
