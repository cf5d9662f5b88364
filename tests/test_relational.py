"""Relational extensions (pipelines/relational.py) + PageRank (ops/graph.py):
each op checked against its own DuckDB oracle at sf0.001 (the driver's
comparison, locally) plus semantic invariants the SQL can't state.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from fundamental_ray.ops import graph as G
from fundamental_ray.pipelines import relational as R

SF = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _assert_matches(got: pd.DataFrame, sql: str):
    exp = _oracle(sql)
    cols = list(got.columns)
    a = got.sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_rollup_matches_and_is_consistent(ray_session):
    got = R.agg_rollup(SF)
    _assert_matches(got, R.AGG_ROLLUP_SQL)
    top = got[(got.returnflag == "ALL") & (got.linestatus == "ALL")]
    fine = got[(got.returnflag != "ALL") & (got.linestatus != "ALL")]
    assert top["n"].iloc[0] == fine["n"].sum()
    assert top["sum_price_cents"].iloc[0] == fine["sum_price_cents"].sum()


def test_moving_avg_matches_and_frames(ray_session):
    got = R.window_moving_avg(SF)
    _assert_matches(got, R.WINDOW_MOVING_AVG_SQL)
    # a customer's FIRST order (by date, orderkey) has frame size 1 →
    # ma3 equals its own price
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    first = (
        orders.sort_values(["o_orderdate", "o_orderkey"])
        .groupby("o_custkey")
        .first()
        .reset_index()
    )
    m = got.merge(first, on=["o_custkey", "o_orderkey"])
    assert len(m) == orders["o_custkey"].nunique()
    cents = np.round(m["o_totalprice"] * 100.0)
    assert np.allclose(m["ma3"], cents / 100.0, atol=1e-6)


def test_cohort_retention_matches(ray_session):
    got = R.events_cohort_retention(SF)
    _assert_matches(got, R.EVENTS_COHORT_RETENTION_SQL)
    # offset-0 cell of a cohort counts every user of that cohort (each
    # user is active in their own first week by definition)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    days = ev["ts"].to_numpy().astype("datetime64[D]").view("int64")
    week = (days + 3) // 7
    cohort = pd.DataFrame({"u": ev["user_id"], "w": week}).groupby("u")["w"].min()
    sizes = cohort.value_counts()
    zero = got[got.week_offset == 0].set_index("cohort_week")["n_users"]
    monday = (sizes.index.to_numpy() * 7 - 3).astype("datetime64[D]")
    for wk, n in zip(np.datetime_as_string(monday, unit="D"), sizes.to_numpy()):
        assert zero[wk] == n


def test_skew_salted_matches(ray_session):
    got = R.agg_skew_salted(SF)
    _assert_matches(got, R.AGG_SKEW_SALTED_SQL)


def test_hash_join_matches(ray_session):
    got = R.join_hash_segments(SF)
    _assert_matches(got, R.JOIN_HASH_SEGMENTS_SQL)
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    assert got["n_orders"].sum() == len(orders)  # every order joins


def test_pagerank_matches_and_sums_to_one(ray_session):
    got = G.pagerank(SF)
    exp = _oracle(G.PAGERANK_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp[["node", "rank"]].reset_index(drop=True),
        check_dtype=False,
    )
    # rank mass is conserved (symmetric graph, no dangling nodes)
    assert got["rank"].sum() == pytest.approx(1.0, abs=1e-6)
    # suppliers (high in-degree side of the bipartite graph) outrank parts
    sup = got[got.node >= G.SUPPLIER_OFFSET]["rank"].mean()
    part = got[got.node < G.SUPPLIER_OFFSET]["rank"].mean()
    assert sup > part


def test_sliding_window_matches_and_double_counts(ray_session):
    got = R.events_sliding_window(SF)
    _assert_matches(got, R.EVENTS_SLIDING_WINDOW_SQL)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    # every event lands in exactly windows-per-event windows
    assert got["n_events"].sum() == len(ev) * R.SLIDE_WINDOWS_PER_EVENT


def test_transition_matrix_matches(ray_session):
    got = R.events_transition_matrix(SF)
    _assert_matches(got, R.EVENTS_TRANSITION_MATRIX_SQL)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    # sum of transitions = events - users (one chain start per user)
    assert got["n"].sum() == len(ev) - ev["user_id"].nunique()


def test_set_ops_membership_matches(ray_session):
    got = R.set_ops_user_membership(SF)
    _assert_matches(got, R.SET_OPS_USER_MEMBERSHIP_SQL)
    assert set(got["setop"]).issubset({"intersect", "click_only", "purchase_only"})


def test_full_outer_daily_matches_all_cases(ray_session):
    got = R.join_full_outer_daily(SF)
    _assert_matches(got, R.JOIN_FULL_OUTER_DAILY_SQL)
    # the calendar must exercise all three match cases
    assert (got["n_orders"] == 0).any()          # ship-only days
    assert (got["n_ships"] == 0).any()           # order-only days
    assert ((got["n_orders"] > 0) & (got["n_ships"] > 0)).any()


def test_unigram_logprob_matches(ray_session):
    from fundamental_ray.ops import corpus_stats as CS

    got = CS.unigram_logprob(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(CS.UNIGRAM_LOGPROB_SQL).fetchdf()
    cols = list(got.columns)
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        exp[cols].sort_values("doc_id").reset_index(drop=True),
        check_dtype=False,
    )
    assert (got["logprob"] < 0).all()


def test_winsorized_prices_matches(ray_session):
    got = R.agg_winsorized_prices(SF)
    _assert_matches(got, R.AGG_WINSORIZED_SQL)
    # winsorized mean sits inside the clip band
    assert ((got["avg_winsorized"] >= got["lo"]) & (got["avg_winsorized"] <= got["hi"])).all()


def test_time_weighted_avg_matches(ray_session):
    got = R.events_time_weighted_avg(SF)
    _assert_matches(got, R.EVENTS_TIME_WEIGHTED_AVG_SQL)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    assert got["tw_avg"].between(ev["value"].min(), ev["value"].max()).all()


def test_logreg_train_matches_and_learns(ray_session):
    from fundamental_ray.ops import model as M

    got = M.logreg_train(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(M.LOGREG_TRAIN_SQL).fetchdf()
    pd.testing.assert_frame_equal(
        got.sort_values("feature").reset_index(drop=True),
        exp[["feature", "value"]].sort_values("feature").reset_index(drop=True),
        check_dtype=False,
    )
    # the classifier must beat the majority-class baseline on its labels
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    n = len(docs)
    n_correct = float(got.set_index("feature").loc["n_correct", "value"])
    labels = con.execute(
        """WITH t AS (SELECT regexp_extract_all(lower(text), '\\S+') AS toks FROM documents),
m AS (SELECT len(toks)::BIGINT AS w,
       CASE WHEN len(toks)=0 THEN 0.0 ELSE list_sum(list_transform(toks, x->length(x)))::DOUBLE/len(toks) END AS mwl,
       CASE WHEN len(toks)=0 THEN 0.0 ELSE len(list_distinct(toks))::DOUBLE/len(toks) END AS dr FROM t)
SELECT count(*) FILTER (w BETWEEN 20 AND 90 AND mwl BETWEEN 3.0 AND 10.0 AND dr >= 0.2) AS pos, count(*) AS n FROM m"""
    ).fetchone()
    majority = max(labels[0], labels[1] - labels[0])
    assert n_correct >= majority


def test_pack_sequences_matches_and_is_contiguous(ray_session):
    from fundamental_ray.ops import pack as P

    got = P.pack_sequences(SF)
    _assert_matches(got, P.PACK_SEQUENCES_SQL)
    # per-lang streams are gapless: walking docs in doc_id order, each doc's
    # prefix (seq_id*B + offset) equals the running token total of its lang
    for _, g in got.groupby("lang"):
        g = g.sort_values("doc_id")
        prefix = g["seq_id"] * P.PACK_SEQ_TOKENS + g["seq_offset"]
        expect = g["n_tok"].cumsum() - g["n_tok"]
        assert (prefix.to_numpy() == expect.to_numpy()).all()
    # exercises multiple buckets and multiple sequences at sf0.001
    assert (got["doc_id"] // P.PACK_BUCKET_SPAN).nunique() > 1
    assert got["seq_id"].max() > 0


def test_label_centroids_matches(ray_session):
    from fundamental_ray.ops import cluster as C

    got = C.label_centroids(SF)
    _assert_matches(got, C.LABEL_CENTROIDS_SQL)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    dims = len(emb["embedding"].iloc[0])
    assert len(got) == emb["label"].nunique() * dims
    # spot-check one (label, dim) against a direct numpy mean
    lab = int(emb["label"].iloc[0])
    m = np.stack(emb.loc[emb["label"] == lab, "embedding"].to_numpy()).astype(np.float64)
    want = np.round(m[:, 0].mean(), 6)
    have = got[(got["label"] == lab) & (got["dim"] == 0)]["centroid"].iloc[0]
    assert abs(have - want) < 1e-9


def test_zscore_outliers_matches(ray_session):
    got = R.events_zscore_outliers(SF)
    _assert_matches(got, R.EVENTS_ZSCORE_SQL)
    assert len(got) > 0
    assert (got["z"].abs() >= R.ZSCORE_THRESHOLD).all()


def test_grouped_mode_matches(ray_session):
    got = R.agg_grouped_mode(SF)
    _assert_matches(got, R.AGG_GROUPED_MODE_SQL)
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderstatus"])
    assert len(got) == orders["o_orderstatus"].nunique()


def test_events_debounce_matches_and_drops(ray_session):
    got = R.events_debounce(SF)
    _assert_matches(got, R.EVENTS_DEBOUNCE_SQL)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id"])
    assert 0 < len(got) < len(ev)  # threshold actually discriminates
    # every user keeps at least their first event
    assert got["user_id"].nunique() == ev["user_id"].nunique()


def test_equidepth_deciles_matches(ray_session):
    got = R.agg_equidepth_deciles(SF)
    _assert_matches(got, R.AGG_EQUIDEPTH_SQL)
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
    assert got["n"].sum() == len(orders)
    assert len(got) == R.N_DECILES
    # equi-depth: every bucket within ±1 of n/10 around interpolated edges
    assert (got["n"] - len(orders) / R.N_DECILES).abs().max() <= 1
    # edges are monotone
    assert (got.sort_values("bucket")["hi"].to_numpy()
            >= got.sort_values("bucket")["lo"].to_numpy()).all()


def test_knn_classify_matches(ray_session):
    from fundamental_ray.ops import ann as N

    got = N.knn_classify(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    exp = con.execute(N.KNN_CLASSIFY_SQL).fetchdf()
    cols = list(got.columns)
    pd.testing.assert_frame_equal(
        got.sort_values("query_id").reset_index(drop=True),
        exp[cols].sort_values("query_id").reset_index(drop=True),
        check_dtype=False,
    )
    assert len(got) == N.KNN_QUERIES
    # vote counts are bounded by k; labels come from the corpus domain
    # (the synthetic embeddings are near-isotropic, so ACCURACY is not a
    # meaningful invariant here — the oracle equality above is the check)
    assert got["votes"].between(1, N.KNN_K).all()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["label"])
    assert got["predicted_label"].isin(emb["label"].unique()).all()


def test_corr_matrix_matches(ray_session):
    got = R.agg_corr_matrix(SF)
    _assert_matches(got, R.AGG_CORR_MATRIX_SQL)
    assert len(got) == 6
    assert got["corr"].abs().le(1.0).all()
    # cross-check one pair against pandas
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"])
    want = li["l_quantity"].corr(li["l_extendedprice"])
    have = got[(got.col_a == "l_quantity") & (got.col_b == "l_extendedprice")]["corr"].iloc[0]
    assert abs(have - want) < 1e-5


def test_gap_fill_matches_and_is_dense(ray_session):
    got = R.events_gap_fill(SF)
    _assert_matches(got, R.EVENTS_GAP_FILL_SQL)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    active = ev.assign(day=ev["ts"].dt.normalize()).groupby(["user_id", "day"]).size()
    assert got["n"].sum() == len(ev)
    assert (got["n"] == 0).any()  # zeros were actually inserted
    assert len(got) > len(active)
    # per user: contiguous daily calendar
    for uid, g in got.groupby("user_id"):
        d = pd.to_datetime(g["day"]).sort_values()
        assert (d.diff().dropna() == pd.Timedelta(days=1)).all()


def test_weighted_sample_matches(ray_session):
    from fundamental_ray.ops import text as T

    got = T.weighted_sample(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(T.WEIGHTED_SAMPLE_SQL).fetchdf()
    cols = list(got.columns)
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        exp[cols].sort_values("doc_id").reset_index(drop=True),
        check_dtype=False,
    )
    assert len(got) == T.WSAMPLE_K
    # weighting bites: sampled docs skew longer than the corpus average
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["n_chars"])
    assert got["n_chars"].mean() > docs["n_chars"].mean()


def test_gini_matches_and_brackets(ray_session):
    got = R.agg_gini_concentration(SF)
    _assert_matches(got, R.AGG_GINI_SQL)
    g = got["gini"].iloc[0]
    assert 0.0 < g < 1.0
    # cross-check against a direct numpy computation
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
    x = np.sort(np.round(o["o_totalprice"].to_numpy() * 100.0).astype(np.int64))
    n = len(x)
    want = 2.0 * float((np.arange(1, n + 1) * x).sum()) / (float(n) * float(x.sum())) - (n + 1.0) / n
    assert abs(g - want) < 1e-6


def test_lang_entropy_matches(ray_session):
    from fundamental_ray.ops import corpus_stats as CS

    got = CS.lang_entropy(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(CS.LANG_ENTROPY_SQL).fetchdf()
    cols = list(got.columns)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp[cols].reset_index(drop=True),
        check_dtype=False,
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang"])
    assert set(got["lang"]) == set(docs["lang"].unique())
    assert (got["entropy"] > 0).all()
    # entropy is bounded by ln(vocab size) per lang
    for _, r in got.iterrows():
        assert r["entropy"] <= np.log(r["n_tokens"]) + 1e-9


def test_agg_cube_lattice_consistency(ray_session):
    from fundamental_ray.pipelines import relational as R

    got = R.agg_cube("/root/testdata/sf0.001")
    fine = got[(got["orderstatus"] != "ALL") & (got["orderpriority"] != "ALL")]
    top = got[(got["orderstatus"] == "ALL") & (got["orderpriority"] == "ALL")]
    # every coarser grouping set must re-aggregate the fine cells exactly
    assert top["n"].iloc[0] == fine["n"].sum()
    assert top["sum_cents"].iloc[0] == fine["sum_cents"].sum()
    by_s = got[(got["orderstatus"] != "ALL") & (got["orderpriority"] == "ALL")]
    chk = fine.groupby("orderstatus")[["sum_cents", "n"]].sum()
    for r in by_s.itertuples():
        assert r.n == chk.loc[r.orderstatus, "n"]
        assert r.sum_cents == chk.loc[r.orderstatus, "sum_cents"]


def test_windowed_topk_and_benford(ray_session):
    wt = R.events_windowed_topk(SF)
    # ranks are 1..K per window, counts non-increasing within a window
    for _, g in wt.groupby("window_start"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["n"].diff().dropna() <= 0).all()
    bf = R.agg_benford_deviation(SF)
    # chi2 >= 0; statuses partition orders
    assert (bf["chi2_benford"] >= 0).all()
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderstatus"])
    assert bf["n_orders"].sum() == len(orders)
    # local recompute of one status's chi2
    tp = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderstatus", "o_totalprice"])
    g = tp[tp["o_orderstatus"] == bf["o_orderstatus"].iloc[0]]
    first = g["o_totalprice"].abs().astype("int64").astype(str).str[0].astype(int)
    n = len(first)
    chi2 = sum(
        (float((first == d).sum()) - n * R.BENFORD_P[d]) ** 2 / (n * R.BENFORD_P[d])
        for d in range(1, 10)
    )
    assert abs(bf["chi2_benford"].iloc[0] - round(chi2, 4)) < 1e-6


def test_ewma_recurrence_semantics(ray_session):
    got = R.events_ewma_value(SF).set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    for uid, per in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        ew = 0.0
        for v in per["value"]:
            ew = (v + ew) / 2.0
        assert got.loc[uid, "ewma_value"] == round(ew, 6)
        assert got.loc[uid, "n_events"] == len(per)


def test_basket_lift_oracle_and_semantics(ray_session):
    got = R.basket_lift(SF)
    _assert_matches(got, R.BASKET_LIFT_SQL)
    assert 0 < len(got) <= R.BASKET_TOPK
    assert (got["cnt"] >= R.BASKET_MIN_SUPPORT).all()
    assert (got["p1"] < got["p2"]).all()  # canonical pair orientation
    # lift re-derivation from raw data for the top row
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    b = li.drop_duplicates()
    n = b["l_orderkey"].nunique()
    r = got.iloc[0]
    ca = (b["l_partkey"] == r["p1"]).sum()
    cb = (b["l_partkey"] == r["p2"]).sum()
    oa = set(b.loc[b["l_partkey"] == r["p1"], "l_orderkey"])
    ob = set(b.loc[b["l_partkey"] == r["p2"], "l_orderkey"])
    cab = len(oa & ob)
    assert r["cnt"] == cab
    assert r["lift"] == round(cab * n / (ca * cb), 6)


def test_link_prediction_oracle_and_semantics(ray_session):
    got = G.link_prediction(SF)
    _assert_matches(got, G.LINK_PREDICTION_SQL)
    assert len(got) > 0
    assert (got["u"] < got["w"]).all()
    assert (got["cn"] >= 1).all()
    assert ((got["jaccard"] > 0) & (got["jaccard"] <= 1)).all()
    # candidates must be NON-edges of the projection
    edges = G._cosupplier_edges(SF)
    eset = set(zip(edges["u"], edges["v"]))
    assert not any((u, w) in eset for u, w in zip(got["u"], got["w"]))
    # triangle_count still matches after the shared-projection refactor
    tri = G.triangle_count(SF)
    _assert_matches(tri, G.TRIANGLE_COUNT_SQL)


def test_opic_matches_oracle_and_conserves_cash(ray_session):
    got = G.opic_importance(SF)
    exp = _oracle(G.OPIC_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp[["node", "importance"]].reset_index(drop=True),
        check_dtype=False,
    )
    # cash is conserved each round (symmetric graph: no dangling loss), so
    # the average of the k+1 unit-mass cash vectors also sums to 1
    assert got["importance"].sum() == pytest.approx(1.0, abs=1e-6)
    # OPIC and PageRank agree on the bipartite ordering: suppliers (high
    # in-degree) accumulate more cash than parts
    sup = got[got.node >= G.SUPPLIER_OFFSET]["importance"].mean()
    part = got[got.node < G.SUPPLIER_OFFSET]["importance"].mean()
    assert sup > part


def test_personalized_pagerank_matches_and_seeds_dominate(ray_session):
    got = G.personalized_pagerank(SF)
    exp = _oracle(G.PERSONALIZED_PAGERANK_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp[["node", "rank"]].reset_index(drop=True),
        check_dtype=False,
    )
    # teleport goes to the seed basket: seeds average strictly above
    # non-seed parts (proximity bias is the point of PPR)
    seeds = got[got.node <= G.PPR_SEED_MAX]["rank"]
    rest = got[(got.node > G.PPR_SEED_MAX) & (got.node < G.SUPPLIER_OFFSET)]["rank"]
    assert len(seeds) > 0
    assert seeds.mean() > rest.mean()
    # mass conserved (symmetric graph, no dangling nodes)
    assert got["rank"].sum() == pytest.approx(1.0, abs=1e-6)


def test_holt_smoothing_matches_and_reduces_to_ewma_on_flat_trend(ray_session):
    got = R.events_holt_smoothing(SF)
    want = _oracle(R.EVENTS_HOLT_SQL).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want[got.columns.tolist()], check_dtype=False
    )
    # single-event users: level == the value, trend == 0, forecast == level
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    singles = ev["user_id"].value_counts()
    singles = set(singles[singles == 1].index)
    if singles:
        sub = got[got["user_id"].isin(singles)]
        assert (sub["trend"] == 0.0).all()
        assert (sub["forecast"] == sub["level"]).all()
    # forecast is always level + trend at 6 dp
    import numpy as np
    assert np.allclose(got["forecast"], (got["level"] + got["trend"]).round(6), atol=2e-6)


def test_rfm_segments_matches_and_quintiles_balanced(ray_session):
    got = R.agg_rfm_segments(SF)
    want = _oracle(R.AGG_RFM_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want[got.columns.tolist()], check_dtype=False
    )
    # NTILE(5) balance: bucket sizes differ by at most one, in every dim
    for c in ("r_score", "f_score", "m_score"):
        sizes = got[c].value_counts()
        assert set(sizes.index) == {1, 2, 3, 4, 5}
        assert sizes.max() - sizes.min() <= 1


def test_interarrival_stats_matches_and_bounds(ray_session):
    got = R.events_interarrival_stats(SF)
    want = _oracle(R.EVENTS_INTERARRIVAL_SQL).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want[got.columns.tolist()], check_dtype=False
    )
    assert (got["min_gap_s"] <= got["median_gap_s"]).all()
    assert (got["median_gap_s"] <= got["max_gap_s"]).all()
    # users with >=2 events each contribute exactly n_events-1 gaps
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    vc = ev["user_id"].value_counts()
    multi = vc[vc >= 2]
    assert got["n_gaps"].sum() == int((multi - 1).sum())
    assert set(got["user_id"]) == set(multi.index)
