"""Training-data ops: dedup suite, ANN, text analysis, multimodal plumbing.

Sketch-based dedup is validated on a constructed corpus with KNOWN near-dup
structure (exact-Jaccard brute force as oracle): emitted pairs must have
perfect precision (verification is exact) and high recall."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from fundamental_ray.ops import ann as N
from fundamental_ray.ops import dedup as D
from fundamental_ray.ops import multimodal as M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def dup_corpus(tmp_path_factory, ray_session):
    """60 base docs + controlled near-dups: exact copies, one-word edits,
    half-overlap rewrites."""
    import hashlib

    words = [f"w{i}" for i in range(50)]

    def text(seed, n=40):
        h = hashlib.blake2b(f"{seed}".encode(), digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "big"))
        return " ".join(rng.choice(words, n))

    rows = []
    for i in range(60):
        t = text(i)
        rows.append({"doc_id": i, "text": t, "lang": "en", "source": "s", "n_chars": len(t)})
    # exact duplicates of docs 0-4
    for k in range(5):
        rows.append({"doc_id": 100 + k, "text": rows[k]["text"], "lang": "en",
                     "source": "s", "n_chars": rows[k]["n_chars"]})
    # near-dups: docs 10-19 with one word changed
    for k in range(10):
        toks = rows[10 + k]["text"].split()
        toks[5] = "CHANGED"
        t = " ".join(toks)
        rows.append({"doc_id": 200 + k, "text": t, "lang": "en", "source": "s",
                     "n_chars": len(t)})
    d = tmp_path_factory.mktemp("dupcorpus")
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def _brute_jaccard(sf_dir, threshold):
    df = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sh = {r.doc_id: D._shingles(r.text) for r in df.itertuples()}
    ids = sorted(sh)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sh[a], sh[b]
            inter = len(sa & sb)
            sim = inter / (len(sa) + len(sb) - inter) if (sa or sb) else 1.0
            if sim >= threshold:
                out.add((a, b))
    return out


def test_exact_dedup_finds_duplicates(dup_corpus):
    res = D.exact_dedup(dup_corpus)
    dups = res[res["dup_count"] > 1]
    assert len(dups) == 5
    assert set(dups["keep_doc_id"]) == {0, 1, 2, 3, 4}  # min doc_id wins


def test_minhash_lsh_precision_and_recall(dup_corpus):
    th = 0.6
    truth = _brute_jaccard(dup_corpus, th)
    got = D.minhash_lsh_pairs(dup_corpus, th)
    got_pairs = set(zip(got["a"], got["b"]))
    # verification is exact → perfect precision
    assert got_pairs <= truth
    # banded LSH at 16×4 catches high-jaccard pairs reliably
    recall = len(got_pairs) / max(1, len(truth))
    assert recall >= 0.9, (len(got_pairs), len(truth))
    # the constructed near-dups (one-word edit ⇒ jaccard ≈ 0.85) are all found
    expected_nd = {(10 + k, 200 + k) for k in range(10)}
    assert expected_nd <= got_pairs


def test_ngram_jaccard_exact_matches_brute(dup_corpus):
    th = 0.6
    truth = _brute_jaccard(dup_corpus, th)
    got = D.ngram_jaccard_pairs(dup_corpus, th)
    assert set(zip(got["a"], got["b"])) == truth


def test_simhash_finds_near_dups(dup_corpus):
    got = D.simhash_pairs(dup_corpus, max_hamming=8)
    pairs = set(zip(got["a"], got["b"]))
    # exact copies have identical simhash (hamming 0)
    assert {(k, 100 + k) for k in range(5)} <= pairs
    zero = got[got["hamming"] == 0]
    assert len(zero) >= 5


def test_embedding_neardup_and_ann(ray_session):
    pairs = D.embedding_neardup_pairs(SF, 0.35)
    assert (pairs["a"] < pairs["b"]).all()
    topk = N.brute_force_topk(SF, k=10, n_queries=5)
    assert len(topk) == 50
    assert (topk.groupby("query_id")["rank"].max() == 10).all()
    # cosine monotonically non-increasing with rank per query
    for _, g in topk.groupby("query_id"):
        assert (g.sort_values("rank")["cosine"].diff().dropna() <= 1e-9).all()

    ivf = N.ivf_topk(SF, k=10, n_queries=5, n_centroids=8, n_probe=4)
    # recall@10 of the bucketed path vs brute force
    r = len(
        set(zip(ivf["query_id"], ivf["neighbor_id"]))
        & set(zip(topk["query_id"], topk["neighbor_id"]))
    ) / len(topk)
    assert r >= 0.5, r


def test_text_ops_basics(ray_session):
    from fundamental_ray.ops import text as T

    tc = T.token_counts(SF)
    assert (tc["ws_tokens"] > 0).all()
    q = T.quality_scores(SF)
    assert ((q["stopword_ratio"] >= 0) & (q["stopword_ratio"] <= 1)).all()
    li = T.lang_id(SF)
    assert set(li["pred_lang"]) <= {"en", "nl", "de", "fr", "und"}
    fp = T.fingerprints(SF)
    assert fp["fingerprint"].str.len().eq(32).all()


def test_winnow_fingerprint_properties(ray_session):
    """Winnowing invariants: deterministic; containment — a doc sharing a
    long substring with another shares winnowed hashes; tiny/empty docs
    well-defined."""
    from fundamental_ray.ops import text as T

    fp = T.winnow_fingerprints(SF)
    assert len(fp) == 500
    assert (fp["n_winnow"] <= fp["n_grams"].clip(lower=1)).all()
    again = T.winnow_fingerprints(SF)
    pd.testing.assert_frame_equal(fp, again)


def test_multimodal_plumbing(ray_session):
    feats = M.media_features(SF, concurrency=1)
    assert len(feats) == 500
    assert (feats["decoded_width"] <= 128).all()
    assert (feats["decoded_height"] <= 128).all()
    assert (feats["feature_norm"] - 1.0).abs().max() < 1e-6
    # determinism: second run byte-identical
    again = M.media_features(SF, concurrency=1)
    pd.testing.assert_frame_equal(feats, again)


def test_decode_stub_rejects_garbage():
    with pytest.raises(ValueError):
        M._decode(b"JPEGnotreally")


def test_embedding_neardup_ivf_recall(ray_session):
    """IVF-bucketed near-dup (the 100-TB path): exact precision by
    construction; recall vs the brute-force pairs measured and high."""
    from fundamental_ray.ops import dedup as D

    SF = "/root/testdata/sf0.01"
    brute = D.embedding_neardup_pairs(SF, 0.35)
    ivf = D.embedding_neardup_ivf(SF, 0.35, n_centroids=16, n_probe=6)
    bset = set(zip(brute["a"], brute["b"]))
    iset = set(zip(ivf["a"], ivf["b"]))
    assert iset <= bset  # precision 1.0 (every pair cosine-verified)
    assert len(iset & bset) / len(bset) >= 0.5  # bucketed recall bound


def test_minhash_estimates_jaccard():
    """Sketch math sanity: the fraction of agreeing signature slots is an
    unbiased Jaccard estimator — over deterministic doc pairs spanning the
    similarity range, the 64-perm estimate tracks the exact value."""
    import numpy as np

    from fundamental_ray.ops.dedup import jaccard, minhash_signature

    base = "the quick brown fox jumps over the lazy dog " * 8
    words = base.split()
    errs = []
    for k in range(0, 40, 5):
        # mutate k words → pairs from near-identical to dissimilar
        mutated = list(words)
        for i in range(k):
            mutated[(i * 7) % len(mutated)] = f"tok{i}"
        a, b = " ".join(words), " ".join(mutated)
        true_j = jaccard(a, b)
        est = float(np.mean(minhash_signature(a) == minhash_signature(b)))
        errs.append(abs(est - true_j))
    assert np.mean(errs) < 0.12  # 64 perms → std ≈ sqrt(j(1-j)/64) ≈ 0.06


def _union_find_labels(edges):
    """Reference DSU — cluster label = component min."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in list(parent)}


def test_connected_components_matches_union_find(ray_session):
    """Star-round CC vs a driver-side union-find reference on adversarial
    graph shapes: a long chain (max propagation depth), disjoint cliques,
    a reversed star (hub has the LARGEST id), and a dense random graph."""
    rng = np.random.RandomState(7)
    cases = {
        "chain": [(i, i + 1) for i in range(50)],
        "cliques": [(i, j) for i in range(5) for j in range(i + 1, 5)]
        + [(10 + i, 10 + j) for i in range(4) for j in range(i + 1, 4)],
        "star_rev": [(100, i) for i in range(20)],
        "random": [tuple(sorted(rng.randint(0, 200, 2))) for _ in range(300)],
    }
    for name, raw in cases.items():
        raw = [(int(a), int(b)) for a, b in raw if a != b]
        expected = _union_find_labels(raw)
        edges = ray.data.from_pandas(
            pd.DataFrame({"u": [a for a, _ in raw], "v": [b for _, b in raw]})
        )
        got = D.connected_components(edges).to_pandas()
        assert dict(zip(got["doc_id"], got["cluster_id"])) == expected, name


def test_duplicate_clusters_consistent_with_pairs(ray_session):
    """Registered query invariants at sf0.001: every verified near-dup
    pair's endpoints land in the same cluster; every cluster_id is the
    min doc_id of its cluster; only paired docs appear."""
    pairs = D.minhash_lsh_pairs(SF, 0.5)
    clusters = D.duplicate_clusters(SF, 0.5)
    label = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    assert set(label) == set(pairs["a"]) | set(pairs["b"])
    for a, b in zip(pairs["a"], pairs["b"]):
        assert label[a] == label[b]
    grp = clusters.groupby("cluster_id")["doc_id"].min()
    assert (grp.index == grp.values).all()


def test_sample_stratified_deterministic_rates(ray_session):
    """Hash sampling: stable across runs, respects per-lang keep rates
    (binomial 3-sigma at sf0.001), and never reads a doc twice."""
    from fundamental_ray.ops import text as T

    s1 = T.sample_stratified(SF)
    s2 = T.sample_stratified(SF)
    pd.testing.assert_frame_equal(s1, s2)
    assert s1["doc_id"].is_unique
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    for lang, grp in docs.groupby("lang"):
        thr = T.SAMPLE_RATES.get(lang, T.SAMPLE_DEFAULT)
        p = thr / T.SAMPLE_MOD
        n = len(grp)
        kept = (s1["lang"] == lang).sum()
        sigma = (n * p * (1 - p)) ** 0.5
        assert abs(kept - n * p) <= 3 * sigma + 1, (lang, kept, n * p)


def test_top_quality_per_lang_matches_driver_topk(ray_session):
    """Combiner top-k equals a single-frame pandas top-k on the same score."""
    from fundamental_ray.ops import text as T
    from fundamental_ray.pipelines.analytics import r2

    got = T.top_quality_per_lang(SF, k=5)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"])
    toks = docs["text"].fillna("").str.findall(T.WORD_RE)
    docs["score"] = r2(
        [float(sum(len(t) for t in ts)) / len(ts) if ts else 0.0 for ts in toks], 4
    )
    exp = (
        docs.sort_values(["lang", "score", "doc_id"], ascending=[True, False, True])
        .groupby("lang", sort=False)
        .head(5)[["doc_id", "lang", "score"]]
        .sort_values(["lang", "score", "doc_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert got.groupby("lang").size().le(5).all()


def test_decontaminate_flags_benchmark_overlap(ray_session):
    """Benchmark docs are fully self-contaminated; a non-benchmark doc's
    count equals its distinct-gram overlap with the benchmark set."""
    from fundamental_ray.ops import text as T

    got = T.decontaminate(SF)
    assert len(got) == 500
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])

    def grams(t):
        ts = T.WORD_RE.findall(t or "")
        return {" ".join(ts[i : i + T.DECON_N]) for i in range(len(ts) - T.DECON_N + 1)}

    bench = set()
    for _, r in docs[docs["doc_id"] % T.DECON_MOD == 0].iterrows():
        bench |= grams(r["text"])
    exp = docs.assign(
        n_contaminated=[len(bench & grams(t)) for t in docs["text"]],
        is_benchmark=docs["doc_id"] % T.DECON_MOD == 0,
    ).sort_values("doc_id")
    g = got.set_index("doc_id")
    e = exp.set_index("doc_id")
    assert (g["n_contaminated"] == e["n_contaminated"]).all()
    assert (g["is_benchmark"] == e["is_benchmark"]).all()
    # every benchmark doc with >=N tokens overlaps itself
    b = g[g["is_benchmark"]]
    toks = e.loc[b.index.intersection(e.index)]
    assert (b["n_contaminated"] > 0).sum() == sum(
        1 for t in docs[docs["doc_id"] % T.DECON_MOD == 0]["text"]
        if len(T.WORD_RE.findall(t or "")) >= T.DECON_N
    )


def test_repetition_scores_bounds_and_known_values(ray_session):
    """Scores live in [0,1); a doc of all-identical words scores ~1; the
    distributed result equals a single-frame recompute."""
    from fundamental_ray.ops import text as T
    from fundamental_ray.pipelines.analytics import r2

    got = T.repetition_scores(SF)
    assert ((got["dup_word_frac"] >= 0) & (got["dup_word_frac"] < 1)).all()
    assert ((got["dup_bigram_frac"] >= 0) & (got["dup_bigram_frac"] < 1)).all()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ts_all = docs["text"].fillna("").map(T.WORD_RE.findall)
    dup_w = [1 - len(set(ts)) / len(ts) if ts else 0.0 for ts in ts_all]
    exp = pd.Series(r2(dup_w, 4), index=docs["doc_id"])
    g = got.set_index("doc_id")["dup_word_frac"]
    assert (g.loc[exp.index] == exp).all()


def test_balance_langs_equalizes_strata(ray_session):
    """Every language's kept count lands within binomial 3-sigma of the
    smallest language's size; output deterministic across runs."""
    from fundamental_ray.ops import text as T

    b1 = T.balance_langs(SF)
    b2 = T.balance_langs(SF)
    pd.testing.assert_frame_equal(b1, b2)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    n = docs.groupby("lang").size()
    mn = n.min()
    kept = b1.groupby("lang").size()
    for lang, total in n.items():
        p = ((mn * T.SAMPLE_MOD) // total) / T.SAMPLE_MOD
        sigma = (total * p * (1 - p)) ** 0.5
        assert abs(kept.get(lang, 0) - total * p) <= 3 * sigma + 1, (lang, kept.get(lang, 0), total * p)


def test_frame_plan_matches_oracle_and_caps(ray_session):
    import duckdb

    got = M.frame_plan(SF, concurrency=1)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(M.FRAME_PLAN_SQL).fetchdf()
    cols = list(got.columns)
    a = got.sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # cap is enforced and short videos expand to fewer frames
    per = got.groupby("media_id").size()
    assert per.max() == M.MAX_FRAMES
    assert per.min() >= 5
    # frame_idx is consistent with the synthesized fps grid
    assert (got["frame_idx"] % np.where(got["frame_no"] > 0, got["frame_no"], 1) == 0).all()


def test_chunk_dedup_keepfirst_semantics(dup_corpus):
    got = D.chunk_dedup(dup_corpus).set_index("doc_id")
    # brute-force keep-first oracle over the same deterministic chunking
    df = pd.read_parquet(f"{dup_corpus}/documents.parquet").sort_values("doc_id")
    seen, want = set(), {}
    for r in df.itertuples():
        kept = []
        for ch in D._chunk_rows(r.text):
            if ch not in seen:
                seen.add(ch)
                kept.append(ch)
        if kept:
            want[r.doc_id] = (" ".join(kept), len(kept))
    assert set(got.index) == set(want)
    for d, (txt, n) in want.items():
        assert got.loc[d, "text_dedup"] == txt
        assert got.loc[d, "n_kept"] == n
    # exact copies of docs 0-4 lose every chunk
    assert not any(100 + k in got.index for k in range(5))
    # one-word-edit near-dups keep exactly the edited chunk (word 5 is in
    # chunk 0 at W=6)
    for k in range(10):
        assert got.loc[200 + k, "n_kept"] == 1


def test_chunk_dedup_128bit_width_matches_60bit(dup_corpus):
    """The full-digest (100-TB) drop index produces identical output to the
    60-bit prefix default — separate cache dirs, same keep-first result."""
    narrow = D.chunk_dedup(dup_corpus, hash_bits=60)
    wide = D.chunk_dedup(dup_corpus, hash_bits=128)
    pd.testing.assert_frame_equal(narrow, wide)
    with pytest.raises(ValueError, match="hash_bits"):
        D._chunk_drop_index(dup_corpus, hash_bits=96)


def test_semdedup_dominance_semantics(ray_session):
    from fundamental_ray.ops import cluster as K

    got = K.semdedup(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    M = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True), 1e-30, None)
    ids = emb["vec_id"].to_numpy(np.int64)
    cl = got.set_index("vec_id")["cluster"]
    kept = got.set_index("vec_id")["kept"]
    # brute-force: dropped iff an earlier same-cluster vector is >= tau
    idx_of = {v: i for i, v in enumerate(ids)}
    for v in ids:
        earlier = [u for u in ids if u < v and cl[u] == cl[v]]
        dom = any(
            np.floor(float(M[idx_of[u]] @ M[idx_of[v]]) * 1e6 + 0.5)
            >= K.SEMDEDUP_TAU * 1e6
            for u in earlier
        )
        assert kept[v] == (0 if dom else 1), v
    assert (got["kept"] == 0).sum() > 0  # discriminates at sf0.001


def test_mmr_rerank_greedy_semantics(ray_session):
    got = N.mmr_rerank(SF)
    assert list(got["rank"]) == list(range(1, N.MMR_K + 1))
    # local greedy recompute over the same pool
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True), 1e-30, None)
    ids = emb["vec_id"].to_numpy(np.int64)
    q = Mn[ids == N.MMR_QUERY_ID][0]
    cos = Mn @ q
    mask = ids != N.MMR_QUERY_ID
    order = np.lexsort((ids[mask], -cos[mask]))[: N.MMR_POOL]
    pids = ids[mask][order]
    P = Mn[mask][order]
    rel = N._cos_int(P @ q)
    sim = N._cos_int(P @ P.T)
    l_num = round(N.MMR_LAMBDA * 10)
    sel = []
    rem = np.ones(len(pids), bool)
    for step in range(N.MMR_K):
        score = 10 * rel if not sel else (
            l_num * rel - (10 - l_num) * sim[:, sel].max(axis=1)
        )
        score = np.where(rem, score, np.iinfo(np.int64).min // 4)
        pick = np.lexsort((pids, -score))[0]
        sel.append(pick)
        rem[pick] = False
    assert list(got["vec_id"]) == [int(pids[i]) for i in sel]
    # diversity: the MMR set must differ from the plain top-k head
    assert list(got["vec_id"]) != list(pids[: N.MMR_K])


def test_containment_pairs_find_exact_and_near_copies(dup_corpus):
    from fundamental_ray.ops import text as T

    got = T.containment_pairs(dup_corpus)
    pairs = {(int(r.a), int(r.b)): float(r.containment) for r in got.itertuples()}
    # exact copies share the full winnow set → containment 1.0
    for k in range(5):
        assert pairs.get((k, 100 + k)) == 1.0, (k, pairs.get((k, 100 + k)))
    # one-word-edit near-dups still share most winnowed hashes
    near = [pairs.get((10 + k, 200 + k), 0.0) for k in range(10)]
    assert min(near) > 0.5


def test_audio_window_plan_semantics(ray_session):
    got = M.audio_window_plan(SF, concurrency=1)
    # windows tile each clip with 25 s stride, 30 s width, >= 1 s coverage
    assert (got["start_s"] == got["win_no"] * M.AUDIO_STRIDE_S).all()
    assert (got["end_s"] - got["start_s"] <= M.AUDIO_WIN_S).all()
    assert (got["end_s"] > got["start_s"]).all()
    per = got.groupby("media_id")["win_no"].max() + 1
    assert (per <= M.MAX_WINDOWS).all()
    # determinism
    pd.testing.assert_frame_equal(got, M.audio_window_plan(SF, concurrency=1))


def test_langid_confusion_diagonal_dominant(ray_session):
    from fundamental_ray.ops import text as T

    cm = T.langid_confusion(SF)
    assert cm["n"].sum() == 500
    # the confusion matrix must agree exactly with a local recompute
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = (
        pd.DataFrame({"lang": docs["lang"].fillna("und"),
                      "pred_lang": T._lang_pred(docs["text"])})
        .groupby(["lang", "pred_lang"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["lang", "pred_lang"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(cm, want.astype({"n": "int64"}))
    # (no accuracy assertion: the synthetic corpus's text is tech words,
    # not per-language stopwords — the matrix itself is the contract)


def test_triangle_count_matches_networkx_free_brute(ray_session):
    from fundamental_ray.ops import graph as GR

    got = GR.triangle_count(SF).iloc[0]
    # local brute force over the same thresholded projection
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
    bip = li.drop_duplicates()
    from collections import defaultdict

    by_part = defaultdict(list)
    for r in bip.itertuples():
        by_part[r.l_partkey].append(r.l_suppkey)
    cnt = defaultdict(int)
    for ss in by_part.values():
        ss = sorted(set(ss))
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                cnt[(ss[i], ss[j])] += 1
    vals = np.array(sorted(cnt.values()), dtype=np.float64)
    th = np.percentile(vals, 75, method="linear")
    edges = {k for k, v in cnt.items() if v >= th}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
    tri = sum(
        1 for (u, v) in edges for w in adj[v] if (u, w) in edges
    )
    wedges = sum(1 for (u, v) in edges for _ in adj[v])
    assert got["n_edges"] == len(edges)
    assert got["n_wedges"] == wedges
    assert got["n_triangles"] == tri


def test_graph_hits_oracle(ray_session):
    import duckdb

    from fundamental_ray.ops import graph as G

    sf = "/root/testdata/sf0.001"
    got = G.hits(sf)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = con.sql(G.HITS_SQL).df()
    assert len(got) == len(want)
    assert got["kind"].tolist() == want["kind"].tolist()
    assert got["node"].tolist() == want["node"].tolist()
    import pandas as pd

    pd.testing.assert_series_equal(
        got["score"], want["score"], check_names=False, rtol=0, atol=1e-12
    )
    # HITS invariants: scores in (0, 1], at least one node per class at
    # the max-normalized ceiling
    for kind in ("authority", "hub"):
        s = got.loc[got["kind"] == kind, "score"]
        assert (s > 0).all() and (s <= 1.0).all() and s.max() == 1.0


def test_incremental_dedup_all_three_statuses(ray_session, tmp_path):
    """Delta-vs-base exact dedup on a corpus crafted to hit every status:
    dup_of_base (incl. a base-internal dup group — index must keep the base
    MIN), dup_in_delta (hash absent from base, repeated in delta), and new.
    Cross-checked against the registry oracle SQL on the same corpus."""
    import duckdb

    mk = lambda i, t: {"doc_id": i, "text": t, "lang": "en", "source": "s",
                       "n_chars": len(t)}
    rows = [
        # base (doc_id % 5 != 0)
        mk(1, "alpha beta gamma"), mk(2, "shared with delta five"),
        mk(3, "unique base three"), mk(7, "base internal dup"),
        mk(8, "base internal dup"), mk(11, "another base text"),
        # delta (doc_id % 5 == 0)
        mk(5, "shared with delta five"),      # dup_of_base -> keep 2
        mk(10, "delta only repeated"),        # new (first)
        mk(20, "delta only repeated"),        # dup_in_delta -> keep 10
        mk(15, "delta unique fifteen"),       # new
        mk(25, "base internal dup"),          # dup_of_base -> keep MIN(7,8)=7
    ]
    d = tmp_path / "incr"
    d.mkdir()
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")

    got = D.incremental_dedup(str(d))
    by_id = got.set_index("doc_id")
    assert by_id.loc[5, "status"] == "dup_of_base" and by_id.loc[5, "keep_doc_id"] == 2
    assert by_id.loc[25, "status"] == "dup_of_base" and by_id.loc[25, "keep_doc_id"] == 7
    assert by_id.loc[10, "status"] == "new" and by_id.loc[10, "keep_doc_id"] == 10
    assert by_id.loc[20, "status"] == "dup_in_delta" and by_id.loc[20, "keep_doc_id"] == 10
    assert by_id.loc[15, "status"] == "new"
    assert set(got["doc_id"]) == {5, 10, 15, 20, 25}

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = con.sql(D.INCREMENTAL_DEDUP_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want[got.columns.tolist()],
        check_dtype=False,
    )

    # index cache is content-fingerprinted: rewriting the corpus in place
    # (same path, different BASE content) must rebuild the base index, not
    # reuse it — doc 31 lands in base and flips delta 15 to dup_of_base
    rows2 = rows + [{"doc_id": 31, "text": "delta unique fifteen",
                     "lang": "en", "source": "s", "n_chars": 20}]
    pd.DataFrame(rows2).to_parquet(d / "documents.parquet")
    got2 = D.incremental_dedup(str(d))
    assert got2.set_index("doc_id").loc[15, "status"] == "dup_of_base"
    assert got2.set_index("doc_id").loc[15, "keep_doc_id"] == 31


def test_lsh_stop_band_cap_bounds_giant_bands(ray_session, tmp_path):
    """Adversarial boilerplate corpus: many identical docs put ALL of them
    in every band's same bucket — uncapped, each of the 16 bands fans out
    C(n,2) pairs. With the stop-band cap the run completes with ZERO
    candidate pairs (identical docs are dedup_exact's job) and the band
    audit reports the overflow instead of truncating silently."""
    import pandas as pd

    from fundamental_ray.ops import dedup as D

    n = 400
    docs = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": ["identical boilerplate nav footer text block here"] * n,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [48] * n,
        }
    )
    d = tmp_path / "adv"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet")

    got = D.minhash_lsh_pairs(str(d), 0.5, band_cap=32)
    assert len(got) == 0  # every band capped → no pair fan-out

    audit = D.lsh_band_audit(str(d), band_cap=32)
    assert len(audit) == D.BANDS
    assert (audit["max_members"] == n).all()  # one giant bucket per band
    assert (audit["n_overflow"] == 1).all()

    # sanity: with the cap ABOVE the cluster size the same corpus explodes
    # into pair candidates again (the cap, not luck, bounded the fan-out)
    audit_hi = D.lsh_band_audit(str(d), band_cap=n + 1)
    assert (audit_hi["n_overflow"] == 0).all()


def test_phash_neardup_recall_bound_and_groups(ray_session):
    """dHash banding vs brute force: at hamming ≤ 6 < 8 bands the
    pigeonhole bound guarantees TOTAL recall — the banded output must
    EQUAL the all-pairs hamming join. The planted 4-variant groups must
    each form a clique (base + three one-pixel perturbations)."""
    import numpy as np
    import pandas as pd

    from fundamental_ray.ops import multimodal as M

    sf = "/root/testdata/sf0.001"
    got = M.phash_neardup(sf)

    ids = pd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_numpy()
    hs = M.dhash_of_pixels(M._pixel_grid(ids))
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(int(hs[i]) ^ int(hs[j])).count("1") <= M.PH_MAX_HAMMING:
                want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    assert set(zip(got["a"], got["b"])) == want

    # planted groups are cliques: every doc pairs with its 3 group mates
    by_group = {}
    for a, b in zip(got["a"], got["b"]):
        if a // M.PH_GROUP == b // M.PH_GROUP:
            by_group.setdefault(a // M.PH_GROUP, set()).add((a, b))
    full_groups = [g for g, n in
                   pd.Series(ids // M.PH_GROUP).value_counts().items()
                   if n == M.PH_GROUP]
    assert full_groups, "corpus too small to contain a full variant group"
    for g in full_groups:
        assert len(by_group.get(g, ())) == 6  # C(4,2)

    # hamming is small inside a group (≤ 4: two single-pixel edits)
    same = got[(got["a"] // M.PH_GROUP) == (got["b"] // M.PH_GROUP)]
    assert (same["hamming"] <= 4).all()


def test_clean_corpus_delta_lineage_is_delta_bounded(ray_session):
    """The delta cleaner's exchanges must be bounded by the DELTA shard,
    the constant filter size, or the eval suite — never the base corpus."""
    import pandas as pd

    from fundamental_ray.ops.bloom import BLOOM_M
    from fundamental_ray.pipelines import clean as CL

    sf = "/root/testdata/sf0.001"
    out = CL.clean_corpus_delta(sf)
    n_docs = len(pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"]))
    n_delta = len(out)
    assert 0 < n_delta < n_docs

    lin = CL.CLEAN_DELTA_LINEAGE
    assert lin["delta_rows"] == n_delta
    assert lin["exact_exchange_rows"] == n_delta     # delta-sized join keys
    assert lin["bloom_probe_rows"] == n_delta        # shuffle-free probe
    assert lin["bloom_filter_bits"] == BLOOM_M       # constant, not corpus
    assert lin["bench_gram_rows"] < n_docs * 100     # eval-suite-bounded

    # verdict sanity: every delta doc got exactly one row, flags are bool
    assert out["doc_id"].is_unique
    assert (out["doc_id"] % CL.DELTA_MOD == CL.DELTA_RESIDUE).all()
    for c in ("rule_quality", "rule_exact_keep", "rule_neardup_keep",
              "rule_decontaminated", "kept"):
        assert out[c].dtype == bool
