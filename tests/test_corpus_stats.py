"""Corpus-stats ops (vocab/gopher/chunks/tfidf), k-means and LSH ANN:
each checked against a DuckDB implementation of the same contract (the
driver-oracle SQL, run here at sf0.001), plus structural properties the
SQL can't see (recall at narrow widths, broadcast boundedness)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from fundamental_ray.ops import ann as N
from fundamental_ray.ops import cluster as K
from fundamental_ray.ops import corpus_stats as CS

SF = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    return con.sql(sql).df()


def _eq(a: pd.DataFrame, b: pd.DataFrame):
    a = a[sorted(a.columns)].sort_values(sorted(a.columns)).reset_index(drop=True)
    b = b[sorted(b.columns)].sort_values(sorted(b.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_vocab_topk_matches_oracle(ray_session):
    got = CS.vocab_topk(SF)
    _eq(got, _oracle(CS.VOCAB_TOPK_SQL))
    # deterministic cutoff: rank-k boundary resolved by (df desc, term)
    assert len(got) == CS.VOCAB_TOPK  # corpus vocab exceeds k, so the cut binds
    assert got["df"].is_monotonic_decreasing  # sorted by df desc
    assert (got["tf"] >= got["df"]).all()  # tf ≥ df always


def test_gopher_filter_matches_oracle(ray_session):
    got = CS.gopher_filter(SF)
    _eq(got, _oracle(CS.GOPHER_FILTER_SQL))
    # rules must discriminate at this sf (a filter that passes or rejects
    # everything is vacuous)
    assert 0 < got["passes"].sum() < len(got)


def test_chunk_windows_matches_oracle(ray_session):
    got = CS.chunk_windows(SF)
    _eq(got, _oracle(CS.CHUNK_WINDOWS_SQL))
    # fan-out: strictly more chunks than docs; stride semantics
    n_docs = len(pd.read_parquet(f"{SF}/documents.parquet"))
    assert len(got) > n_docs
    assert (got["start_tok"] == got["chunk_idx"] * CS.CHUNK_STRIDE).all()
    assert (got["n_tok"] <= CS.CHUNK_TOKENS).all() and (got["n_tok"] > 0).all()
    # chunk text round-trips its token slice
    r = got.iloc[0]
    assert len(r["chunk_text"].split()) == r["n_tok"]


def test_tfidf_topterms_matches_oracle(ray_session):
    got = CS.tfidf_topterms(SF)
    _eq(got, _oracle(CS.TFIDF_TOPTERMS_SQL))
    assert set(got["rank"]) == {1, 2, 3}
    # rank-1 term of each doc has the doc's max tf (ordering contract)


def test_kmeans_matches_sql_unrolling(ray_session):
    got = K.kmeans_clusters(SF)
    _eq(got, _oracle(K.KMEANS_CLUSTERS_SQL))
    # k-means on this clustered corpus should produce >1 non-trivial
    # cluster, and every vector is assigned exactly once
    n = len(pd.read_parquet(f"{SF}/embeddings.parquet"))
    assert len(got) == n
    assert got["cluster"].nunique() > 1


def test_kmeans_iterations_refine(ray_session):
    """More Lloyd rounds must not increase within-cluster SSE (sanity of
    the distributed partial-sum fold)."""
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.stack(emb.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)

    def sse(assign_df):
        a = assign_df.sort_values("vec_id")["cluster"].to_numpy()
        tot = 0.0
        for c in np.unique(a):
            m = mat[a == c]
            tot += ((m - m.mean(axis=0)) ** 2).sum()
        return tot

    s1 = sse(K.kmeans_clusters(SF, iters=1))
    s3 = sse(K.kmeans_clusters(SF, iters=3))
    assert s3 <= s1 + 1e-9


def test_lsh_topk_exact_at_registered_width(ray_session):
    got = N.lsh_topk(SF)
    brute = N.brute_force_topk(SF)
    _eq(got, brute)


def test_lsh_narrow_width_recall(ray_session):
    """radius-0 single-bucket probing: recall below 1 is expected, but the
    emitted neighbors must still be a SUBSET of true candidates with
    correct cosines (precision 1.0 on emitted pairs)."""
    got = N.lsh_topk(SF, radius=0, n_tables=2)
    brute = N.brute_force_topk(SF, k=500)  # full truth list (corpus-sized)
    truth = {(r.query_id, r.neighbor_id): r.cosine for r in brute.itertuples()}
    for r in got.itertuples():
        assert (r.query_id, r.neighbor_id) in truth
        assert abs(truth[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9
    # and the registered width's recall@10 measured here for the record
    full = N.lsh_topk(SF)
    b10 = N.brute_force_topk(SF)
    hit = len(
        set(zip(full["query_id"], full["neighbor_id"]))
        & set(zip(b10["query_id"], b10["neighbor_id"]))
    )
    assert hit / len(b10) >= 0.9


def test_heavy_hitters_matches_exact(ray_session):
    from fundamental_ray.ops.corpus_stats import _misra_gries

    got = CS.vocab_heavy_hitters(SF)
    _eq(got, _oracle(CS.VOCAB_HEAVY_HITTERS_SQL))
    # the MG kernel itself: lower bounds within n/capacity of true counts
    stream = ["a"] * 50 + ["b"] * 30 + list("cdefghij") * 2 + ["a"] * 20
    mg = _misra_gries(iter(stream), 4)
    assert len(mg) <= 4
    true = {"a": 70, "b": 30}
    for t, lb in mg.items():
        assert lb <= stream.count(t)
        assert stream.count(t) - lb <= len(stream) / 4
    assert "a" in mg  # freq 70 > n/4 = 24 must survive


def test_heavy_hitters_constrained_capacity_recall(ray_session):
    """Even at a tight sketch capacity the heavy tail survives: candidates
    recovered by pass 1 must include every term whose true tf > N/cap."""
    import duckdb

    got = CS.vocab_heavy_hitters(SF, capacity=8)
    truth = _oracle(CS.VOCAB_HEAVY_HITTERS_SQL)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    n_tokens = con.sql(
        r"SELECT sum(len(regexp_extract_all(lower(text),'\S+'))) FROM documents"
    ).fetchone()[0]
    guaranteed = truth[truth["tf"] > n_tokens / 8]["term"]
    assert set(guaranteed) <= set(got["term"])


def test_inverted_index_search(ray_session):
    from fundamental_ray.ops import index as IX

    got = IX.search_and(SF)
    want = _oracle(IX.SEARCH_AND_SQL)
    _eq(got, want)
    assert 0 < len(got) < 500  # discriminates
    # 2-term variant agrees with SQL too (different bucket routing)
    got2 = IX.search_and(SF, terms=("vector", "customer"))
    want2 = _oracle(IX.search_and_sql(("vector", "customer")))
    _eq(got2, want2)
    # absent term → empty result, not an error
    got3 = IX.search_and(SF, terms=("window", "zzzznotaterm"))
    assert len(got3) == 0


def test_bm25_topk_matches_oracle(ray_session):
    from fundamental_ray.ops import index as IX

    got = IX.bm25_topk(SF)
    want = _oracle(IX.BM25_TOPK_SQL)
    _eq(got, want)
    assert got["rank"].tolist() == list(range(1, len(got) + 1))
    assert got["score"].is_monotonic_decreasing
    # absent-term query scores nothing
    assert len(IX.bm25_topk(SF, terms=("zzzznotaterm",))) == 0


def test_clean_corpus_pipeline(ray_session):
    """Composite cleaning pipeline: flags agree with the standalone
    registered ops, and the conjunction is consistent."""
    from fundamental_ray.ops import dedup as D
    from fundamental_ray.pipelines import clean as CL

    got = CL.clean_corpus(SF)
    assert len(got) == 500
    # conjunction consistency
    conj = (got["rule_quality"] & got["rule_exact_keep"]
            & got["rule_neardup_keep"] & got["rule_decontaminated"])
    assert (got["kept"] == conj).all()
    # quality flag == gopher_filter's conjunction
    goph = CS.gopher_filter(SF)
    assert (got.set_index("doc_id")["rule_quality"]
            == goph.set_index("doc_id")["passes"]).all()
    # near-dup losers == duplicate_clusters non-representatives
    cl = D.duplicate_clusters(SF, 0.5)
    losers = set(cl.loc[cl["doc_id"] != cl["cluster_id"], "doc_id"])
    assert set(got.loc[~got["rule_neardup_keep"], "doc_id"]) == losers
    # discriminates: some docs dropped, some kept
    assert 0 < got["kept"].sum() < len(got)


def test_phrase_search_matches_oracle(ray_session):
    from fundamental_ray.ops import index as IX

    got = IX.phrase_search(SF)
    _eq(got, _oracle(IX.PHRASE_SEARCH_SQL))
    assert 0 < len(got) < 500
    # 3-word phrase and absent phrase both behave
    got3 = IX.phrase_search(SF, phrase=("window", "merge", "scan"))
    _eq(got3, _oracle(IX.phrase_search_sql(("window", "merge", "scan"))))
    assert len(IX.phrase_search(SF, phrase=("window", "zzzznot"))) == 0


def test_dsir_weights_favor_target_slice(ray_session):
    got = CS.dsir_weights(SF).set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    en = set(docs.loc[docs["lang"] == CS.DSIR_TARGET_LANG, "doc_id"])
    w_en = got.loc[[i for i in got.index if i in en], "dsir_logweight"]
    w_ot = got.loc[[i for i in got.index if i not in en], "dsir_logweight"]
    # importance weights must rank the target slice above the rest on average
    assert w_en.mean() > w_ot.mean()
    # n_grams = 2*len(words) - 1 for single-space text
    r = docs.iloc[0]
    n_words = len(r["text"].split(" "))
    assert got.loc[r["doc_id"], "n_grams"] == 2 * n_words - 1
    # local recompute of one doc's score from first principles
    import hashlib

    import numpy as np

    grams_all = CS._dsir_grams(docs["text"])
    ex = grams_all.explode()
    b_all = CS._dsir_buckets(ex)
    tgt = docs["lang"].reindex(ex.index).eq(CS.DSIR_TARGET_LANG).to_numpy()
    c_raw = np.bincount(b_all, minlength=CS.DSIR_BUCKETS)
    c_tgt = np.bincount(b_all[tgt], minlength=CS.DSIR_BUCKETS)
    lw = np.log((c_tgt + 1.0) / (c_tgt.sum() + CS.DSIR_BUCKETS)) - np.log(
        (c_raw + 1.0) / (c_raw.sum() + CS.DSIR_BUCKETS)
    )
    doc0 = docs.index[0]
    want = lw[b_all[ex.index == doc0]].sum()
    assert abs(got.loc[docs.loc[doc0, "doc_id"], "dsir_logweight"] - want) < 1e-5


def test_select_corpus_exact_top_half(ray_session):
    got = CS.select_corpus(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    keep = CS._gopher_pass_mask(docs["text"])
    passing = docs[keep].reset_index(drop=True)
    # local DSIR recompute over the passing slice
    grams = CS._dsir_grams(passing["text"])
    ex = grams.explode().dropna()
    b = CS._dsir_buckets(ex)
    tgt = passing["lang"].reindex(ex.index).eq(CS.DSIR_TARGET_LANG).to_numpy()
    c_raw = np.bincount(b, minlength=CS.DSIR_BUCKETS)
    c_tgt = np.bincount(b[tgt], minlength=CS.DSIR_BUCKETS)
    lw = np.log((c_tgt + 1.0) / (c_tgt.sum() + CS.DSIR_BUCKETS)) - np.log(
        (c_raw + 1.0) / (c_raw.sum() + CS.DSIR_BUCKETS)
    )
    sums = pd.Series(lw[b], index=ex.index).groupby(level=0).sum()
    w_int = np.floor(sums.to_numpy() * 1e6 + 0.5).astype(np.int64)
    sel = (
        pd.DataFrame({"doc_id": passing["doc_id"].to_numpy(np.int64), "w": w_int})
        .sort_values(["w", "doc_id"], ascending=[False, True])
        .head((len(passing) + 1) // 2)
    )
    assert set(got["doc_id"]) == set(sel["doc_id"])
    assert len(got) == (len(passing) + 1) // 2
    # weights round-trip the micro-int contract
    m = got.set_index("doc_id")["dsir_logweight"]
    for d, w in zip(sel["doc_id"], sel["w"]):
        assert m[d] == w / 1e6


def test_bpe_train_greedy_semantics(ray_session, tmp_path):
    from fundamental_ray.ops import bpe as B

    # overlap-run edge case: 'aaaa' under merge (a,a) must become 'aa aa'
    assert B._apply_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert B._apply_merge(list("aaa"), "a", "a") == ["aa", "a"]
    # constructed corpus with known best merges: 'ab' dominates
    docs = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["ab ab ab abc", "ab abc abc"],
         "lang": ["en", "en"], "source": ["s", "s"], "n_chars": [12, 10]}
    )
    d = tmp_path / "bpecorp"; d.mkdir()
    docs.to_parquet(d / "documents.parquet")
    got = B.bpe_train(str(d), n_merges=3)
    # step 1: pair (a,b) appears in all 7 words -> count 7
    assert got.iloc[0][["l_sym", "r_sym", "pair_count"]].tolist() == ["a", "b", 7]
    # step 2: ('ab','</w>') from the 5 plain 'ab' words beats ('ab','c')... 
    assert got.iloc[1]["merged"] in ("ab</w>", "abc")
    # full run on testdata is deterministic
    a = B.bpe_train(SF); b = B.bpe_train(SF)
    pd.testing.assert_frame_equal(a, b)


def test_bpe_encode_consistency(ray_session):
    from fundamental_ray.ops import bpe as B

    enc = B.bpe_encode(SF)
    # merges only ever shrink the symbol count; floor is n_words (one
    # symbol per word), ceiling is chars + end marks
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = docs["text"].str.lower().str.findall(CS.WORD_RE)
    chars = toks.map(lambda ts: sum(len(t) + 1 for t in ts)).to_numpy()
    m = enc.set_index("doc_id")
    ids = docs["doc_id"].to_numpy()
    assert (m.loc[ids, "n_bpe_tokens"].to_numpy() <= chars).all()
    assert (m["n_bpe_tokens"] >= m["n_words"]).all()
    # local recompute of one full doc's token count vs the encode output
    merges = B.bpe_train(SF)

    def n_sym(word):
        syms = list(word) + [B.END_MARK]
        for r in merges.itertuples():
            syms = B._apply_merge(syms, r.l_sym, r.r_sym)
        return len(syms)

    doc0 = docs.iloc[0]
    want0 = sum(n_sym(w) for w in toks.iloc[0])
    assert m.loc[doc0["doc_id"], "n_bpe_tokens"] == want0


def test_power_iteration_guarantees(ray_session):
    got = K.power_iteration_pc1(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    w, V = np.linalg.eigh(X.T @ X)
    pc1, lam1 = V[:, -1], w[-1]
    v = got.sort_values("dim_idx")["val"].to_numpy()
    # distributed iterate == local rounded power iteration, exactly
    vv = np.ones(X.shape[1])
    rayleighs = []
    for _ in range(K.PI_ITERS):
        wv = X.T @ (X @ vv)
        rayleighs.append(float(np.linalg.norm(wv)) / np.linalg.norm(vv))
        vv = np.floor(wv / np.linalg.norm(wv) * 1e6 + 0.5) / 1e6
    assert np.allclose(v, vv, atol=1e-9)
    # guarantees of the iteration (spectrum-independent):
    assert all(b >= a - 1e-6 for a, b in zip(rayleighs, rayleighs[1:]))
    assert got["eigval_norm"].iloc[0] <= lam1 * (1 + 1e-6)
    cos0 = abs(np.ones(len(pc1)) @ pc1) / np.sqrt(len(pc1))
    cos5 = abs(v @ pc1) / np.linalg.norm(v)
    assert cos5 > cos0  # alignment strictly improves from the start


def test_ngram_novelty_keepfirst_properties(ray_session):
    got = CS.ngram_novelty(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id")
    # brute-force keep-first over (doc_id, position) order
    seen = set()
    want = {}
    for r in docs.itertuples():
        ws = r.text.lower().split(" ")
        grams = [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
        novel = 0
        for g in grams:
            if g not in seen:
                seen.add(g)
                novel += 1
        if grams:
            want[r.doc_id] = (len(grams), novel)
    m = got.set_index("doc_id")
    assert set(m.index) == set(want)
    for d, (n, nov) in want.items():
        assert m.loc[d, "n_grams"] == n
        assert m.loc[d, "n_novel"] == nov
    # the earliest doc is maximally novel; novelty declines on average
    first = docs["doc_id"].iloc[0]
    assert m.loc[first, "novelty"] == 1.0


def test_kl_price_drift_properties(ray_session):
    from fundamental_ray.pipelines import relational as R

    got = R.agg_kl_price_drift(SF)
    # KL >= 0 always; statuses partition the orders
    assert (got["kl_divergence"] >= 0).all()
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderstatus"])
    assert got["n_orders"].sum() == len(orders)


def test_zipf_slope_matches_oracle(ray_session):
    got = CS.zipf_slope(SF)
    _eq(got, _oracle(CS.ZIPF_SLOPE_SQL))
    # natural-ish synthetic text: slope is negative (frequency decays in
    # rank) and the fit uses the whole (bounded) vocab
    assert got["slope"].iloc[0] < 0
    assert 0 < got["n_terms"].iloc[0] <= CS.ZIPF_TOPN
