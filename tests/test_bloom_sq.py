"""Bloom-filter delta dedup (ops/bloom.py) and scalar-quantized ANN
(ops/ann.py::sq_topk): oracle parity at sf0.001 (the registry sweep covers
sf0.01) plus the contracts the oracles can't see — that exact base
duplicates always saturate the filter (no false NEGATIVES, the Bloom
guarantee), and that SQ8's approximate ranking stays close to the exact
brute-force baseline (recall bound)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("documents", "embeddings")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _cmp(got: pd.DataFrame, want: pd.DataFrame):
    assert len(got) == len(want)
    assert sorted(got.columns) == sorted(want.columns)
    g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
    for c in g.columns:
        assert g[c].astype(str).tolist() == w[c].astype(str).tolist(), c


def test_bloom_delta_oracle(ray_session, duck):
    from fundamental_ray.ops import bloom as B

    got = B.bloom_delta_dedup(SF)
    want = duck.sql(B.BLOOM_DELTA_SQL).df()
    _cmp(got, want)
    # every delta doc reported exactly once, tallies internally consistent
    n_delta = duck.sql("SELECT COUNT(*) FROM documents WHERE doc_id % 2 = 1").fetchone()[0]
    assert len(got) == n_delta
    assert (got["n_hits"] <= got["n_chunks"]).all()
    assert ((got["dup_frac"] >= 0.0) & (got["dup_frac"] <= 1.0)).all()


def test_bloom_no_false_negatives(ray_session):
    """Bloom filters admit false positives but never false NEGATIVES: every
    delta chunk whose literal string also occurs among base chunks must be
    counted as a hit. Run at sf0.01, whose corpus has real cross-split
    chunk overlap (sf0.001 has none)."""
    from fundamental_ray.ops import bloom as B

    sf = "/root/testdata/sf0.01"
    got = B.bloom_delta_dedup(sf).set_index("doc_id")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    exact = con.sql(
        f"""
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word,
                 unnest(range(len(string_split(text, ' ')))) AS wi
          FROM documents),
        ch AS (
          SELECT doc_id, wi // {B.BLOOM_W} AS ci,
                 string_agg(word, ' ' ORDER BY wi) AS chunk
          FROM w GROUP BY doc_id, wi // {B.BLOOM_W})
        SELECT d.doc_id, COUNT(*)::BIGINT AS exact_hits
        FROM ch d
        WHERE d.doc_id % 2 = 1 AND EXISTS (
          SELECT 1 FROM ch b WHERE b.doc_id % 2 = 0 AND b.chunk = d.chunk)
        GROUP BY d.doc_id
        """
    ).df()
    assert len(exact) > 0, "sf0.01 must contain cross-split chunk overlap"
    for _, r in exact.iterrows():
        assert got.loc[int(r["doc_id"]), "n_hits"] >= r["exact_hits"]


def test_sq_topk_oracle_and_recall(ray_session, duck):
    from fundamental_ray.ops import ann as N

    got = N.sq_topk(SF)
    want = duck.sql(N.SQ_TOPK_SQL).df()
    _cmp(got, want)
    # quantization fidelity: SQ8 top-10 should recover most of the exact
    # brute-force top-10 (64 dims, 256 levels -> high-resolution grid)
    exact = duck.sql(N.brute_force_topk_sql()).df()
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact.loc[exact["query_id"] == qid, "neighbor_id"])
        s = set(got.loc[got["query_id"] == qid, "neighbor_id"])
        recalls.append(len(e & s) / len(e))
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_pq_topk_oracle_and_recall(ray_session, duck):
    from fundamental_ray.ops import ann as N
    from fundamental_ray.ops import pq as P

    got = P.pq_topk(SF)
    want = duck.sql(P.PQ_TOPK_SQL).df()
    _cmp(got, want)
    # 32x32 codebooks (5-bit codes): coarser than SQ8, but top-10 must
    # still recover most of the exact brute-force top-10 (deterministic
    # 0.80 at this corpus; margin for future corpus regeneration)
    exact = duck.sql(N.brute_force_topk_sql()).df()
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact.loc[exact["query_id"] == qid, "neighbor_id"])
        s = set(got.loc[got["query_id"] == qid, "neighbor_id"])
        recalls.append(len(e & s) / len(e))
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_pq_codebook_contract(ray_session):
    """Training determinism: two independent runs produce bit-identical
    codebooks (the rounded-Lloyd contract the SQL oracle relies on), and
    codes cover at most k_sub distinct values per subspace."""
    import numpy as np

    from fundamental_ray.ops import pq as P

    b1 = P.train_codebooks(SF)
    b2 = P.train_codebooks(SF)
    assert np.array_equal(b1, b2)
    assert b1.shape == (P.PQ_M, P.PQ_KSUB, 64 // P.PQ_M)


def test_count_min_oracle_and_one_sided_error(ray_session, duck):
    """Count-min: oracle parity at sf0.001 plus the sketch's defining
    one-sided error — estimates never undercount, and at the registered
    width (32 < vocab) some overestimates must actually occur."""
    from fundamental_ray.ops import sketch as SK

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    got = SK.sketch_count_min_terms(SF)
    want = con.sql(SK.SKETCH_COUNT_MIN_SQL).df()
    _cmp(got, want)
    assert (got["tf_est"] >= got["tf_exact"]).all()
    assert (got["overestimate"] > 0).any(), "width must force live collisions"
    # total mass conservation per sketch row: sum of exact tfs == row sum
    assert got["tf_exact"].sum() == duckdb.sql(
        f"SELECT count(*) FROM (SELECT unnest(regexp_extract_all(lower(text), '\\S+')) "
        f"FROM read_parquet('{SF}/documents.parquet'))"
    ).fetchone()[0]


def test_dedup_method_report_invariants(ray_session):
    """Cross-method audit: exact duplicates are jaccard-1.0 and hamming-0
    pairs, so the exact count can never exceed the minhash or simhash
    counts (recall-1.0 subsumption at identical text)."""
    from fundamental_ray.ops import dedup as D

    got = D.dedup_method_report(SF).set_index("method")["n_docs"]
    assert set(got.index) == {"exact", "minhash_lsh", "simhash", "embedding",
                              "bloom_delta"}
    assert (got >= 0).all()
    assert got["exact"] <= got["minhash_lsh"]
    assert got["exact"] <= got["simhash"]
