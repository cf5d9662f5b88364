"""Inverted-index build + boolean search over the documents table — the
text-retrieval twin of the crawl engine's bucketed fetch index
(crawl/fetchstore.py) and the ANN bucket indexes (ops/ann.py).

Build (one Dataset pass, one low-cardinality exchange): documents fan out
to (term, doc_id) posting rows inside ``map_batches`` (per-batch dedup —
each doc contributes one row per DISTINCT term), each row is routed to
``bucket = crc32(term) % num_buckets``, and the posting rows land in
bucket-partitioned Parquet. The shuffle is bounded by distinct
(term, doc) pairs, never raw token volume.

Search (a conjunctive term query): hash each query term to its bucket and
read ONLY those bucket partitions back (path-pruned scan, exactly like the
fetch index's point reads), filter to the query terms, intersect posting
lists. Cost is proportional to the queried terms' posting sizes —
independent of corpus size for selective terms.
"""

from __future__ import annotations
from fundamental_ray.sources.parquet import read_parquet_clean
from fundamental_ray.state.diskcache import cache_valid, mark_done, source_fingerprint

import os
import zlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .text import WORD_RE


def _sql_safe_terms(terms, allow_dup: bool = False):
    """The *_sql builders interpolate terms into SQL literals and column
    aliases — restrict to identifier-safe tokens so engine and oracle can
    never diverge on exotic input (quotes, dashes, duplicates). Phrases
    may legitimately repeat a word (``allow_dup``); set queries may not
    (a duplicate would double-count in Python but alias-collide in SQL)."""
    import re as _re

    out = [t.lower() for t in terms]
    for t in out:
        if not _re.fullmatch(r"[a-z0-9_]+", t):
            raise ValueError(f"query term {t!r} is not SQL-identifier-safe")
    if not allow_dup and len(set(out)) != len(out):
        raise ValueError("duplicate query terms")
    return out

INDEX_BUCKETS = 16
# registered query terms: mid-frequency at the synthetic corpus (the
# 3-way AND keeps ~272 of 500 docs at sf0.01 — discriminates, not vacuous)
SEARCH_TERMS = ("window", "merge", "scan")


def build_inverted_index(sf_dir: str, num_buckets: int = INDEX_BUCKETS) -> str:
    """Bucket-partitioned (term, doc_id) posting store; idempotent per
    (corpus, params) like build_ivf_index/build_lsh_index."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/fr_invidx/{tag}-b{num_buckets}-v1"
    fp = source_fingerprint(
        f"{sf_dir}/documents.parquet", extra=f"inv-b{num_buckets}-v1"
    )
    if cache_valid(out, fp):
        return out
    os.makedirs(out, exist_ok=True)

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        terms, docs = [], []
        for doc_id, ts in zip(df["doc_id"], toks):
            for t in set(ts):  # per-doc distinct: one posting per (term, doc)
                terms.append(t)
                docs.append(doc_id)
        pdf = pd.DataFrame({"term": terms, "doc_id": docs})
        pdf["doc_id"] = pdf["doc_id"].astype("int64")
        pdf["bucket"] = [
            zlib.crc32(t.encode("utf-8")) % num_buckets for t in pdf["term"]
        ]
        return pdf

    (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(postings, batch_format="pandas")
        .write_parquet(out, partition_cols=["bucket"])
    )
    mark_done(out, fp)
    return out


def search_and(sf_dir: str, terms=SEARCH_TERMS) -> pd.DataFrame:
    """Conjunctive (AND) term search: doc_ids containing EVERY query term.
    Reads only the query terms' bucket partitions."""
    import glob as _glob

    index_dir = build_inverted_index(sf_dir)
    terms = [t.lower() for t in terms]
    by_bucket: dict[int, list[str]] = {}
    for t in terms:
        by_bucket.setdefault(zlib.crc32(t.encode("utf-8")) % INDEX_BUCKETS, []).append(t)

    @ray.remote(num_cpus=1)
    def read_postings(files: list[str], wanted: list[str]):
        import pyarrow.parquet as pq

        t = pq.read_table(files, columns=["term", "doc_id"])
        t = t.filter(pc.is_in(t.column("term"), value_set=pa.array(wanted)))
        out = {}
        for term, doc in zip(
            t.column("term").to_pylist(), t.column("doc_id").to_pylist()
        ):
            out.setdefault(term, set()).add(doc)
        return out

    refs = []
    for b, wanted in sorted(by_bucket.items()):
        files = sorted(
            _glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet"))
        )
        if files:
            refs.append(read_postings.remote(files, sorted(wanted)))
    posting: dict[str, set] = {}
    for part in ray.get(refs):
        for term, docs in part.items():
            posting.setdefault(term, set()).update(docs)
    if any(t not in posting for t in terms):
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    hit = set.intersection(*(posting[t] for t in terms))
    return pd.DataFrame({"doc_id": sorted(hit)}).astype({"doc_id": "int64"})


def search_and_sql(terms=SEARCH_TERMS) -> str:
    conds = " AND ".join(
        f"list_contains(regexp_extract_all(lower(text), '\\S+'), '{t}')"
        for t in _sql_safe_terms(terms)
    )
    return f"SELECT doc_id FROM documents WHERE {conds} ORDER BY doc_id"


SEARCH_AND_SQL = search_and_sql()


# ------------------------------------------------------------------ BM25
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 15
BM25_QUERY = ("window", "merge", "scan")


def bm25_topk(
    sf_dir: str, terms=BM25_QUERY, k: int = BM25_TOPK,
    k1: float = BM25_K1, b: float = BM25_B,
) -> pd.DataFrame:
    """Ranked (disjunctive) retrieval: BM25 score of every document
    against the query terms, top-k.

    Scale shape: corpus stats (N, avgdl) and per-term df come from ONE
    distributed aggregation pass (constant-size result), broadcast via
    ``ray.put``; scoring is a second streaming ``map_batches`` pass that
    emits ONLY each block's top-k candidates (per-block combiner), merged
    by a tiny driver-side reduce — the classic scatter-gather ranked
    retrieval plan. The inverted index is not needed for full-corpus
    scoring (that path is for selective point lookups — search_and).

    Determinism: ranking key is (round(score, 6) desc, doc_id asc) and the
    emitted score is rounded half-away to 6 dp — the same
    cross-engine-reproducibility contract as cluster_kmeans (raw float
    ordering would be ulp-sensitive vs the SQL oracle)."""
    import numpy as np

    from ..pipelines.analytics import r2

    terms = [t.lower() for t in terms]

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        n_docs = len(df)
        total_len = int(toks.map(len).sum())
        row = {"n_docs_part": np.int64(n_docs),
               "total_len_part": np.int64(total_len)}
        for t in terms:
            row[f"df_{t}"] = np.int64(sum(t in set(ts) for ts in toks))
        return pd.DataFrame([row])

    agg = (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(stats_partial, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    n_docs = int(agg["n_docs_part"])
    avgdl = float(agg["total_len_part"]) / max(n_docs, 1)
    idf = {
        t: float(np.log((n_docs - int(agg[f"df_{t}"]) + 0.5)
                        / (int(agg[f"df_{t}"]) + 0.5) + 1.0))
        for t in terms
    }
    sref = ray.put((terms, idf, avgdl))

    def score_block(df: pd.DataFrame) -> pd.DataFrame:
        terms_, idf_, avgdl_ = ray.get(sref)
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        dl = toks.map(len).to_numpy(dtype=np.float64)
        score = np.zeros(len(df))
        for t in terms_:
            tf = toks.map(lambda ts, t=t: ts.count(t)).to_numpy(dtype=np.float64)
            score += idf_[t] * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * dl / avgdl_)
            )
        out = pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "score": r2(score, 6)}
        )
        out = out[out["score"] > 0]
        return out.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(k)  # per-block combiner: ≤ k rows leave each block

    cand = (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(score_block, batch_format="pandas")
        .to_pandas()
    )
    if cand.empty:  # nothing scored > 0 (e.g. absent-term query)
        return pd.DataFrame(
            {"rank": pd.Series([], dtype="int64"),
             "doc_id": pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="float64")}
        )
    out = (
        cand.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = pd.Series(range(1, len(out) + 1), dtype="int64")
    return out[["rank", "doc_id", "score"]]


def bm25_topk_sql(
    terms=BM25_QUERY, k: int = BM25_TOPK,
    k1: float = BM25_K1, b: float = BM25_B,
) -> str:
    terms = _sql_safe_terms(terms)
    per_term = " + ".join(
        f"""(ln((s.n_docs - d.df_{t} + 0.5) / (d.df_{t} + 0.5) + 1.0)
   * (t.tf_{t} * ({k1} + 1))
   / (t.tf_{t} + {k1} * (1 - {b} + {b} * t.dl / s.avgdl)))"""
        for t in terms
    )
    tf_cols = ",\n         ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::DOUBLE AS tf_{t}"
        for t in terms
    )
    df_cols = ", ".join(
        f"count(*) FILTER (tf_{t} > 0)::BIGINT AS df_{t}" for t in terms
    )
    return f"""
WITH t AS (
  SELECT doc_id, len(toks)::DOUBLE AS dl,
         {tf_cols}
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS toks
        FROM documents)
), s AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM t
), d AS (
  SELECT {df_cols} FROM t
), scored AS (
  SELECT t.doc_id, ROUND({per_term}, 6) AS score
  FROM t, s, d
)
SELECT ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
       doc_id, score
FROM scored WHERE score > 0
ORDER BY score DESC, doc_id LIMIT {k}
"""


BM25_TOPK_SQL = bm25_topk_sql()


# -------------------------------------------------------- phrase search
PHRASE_QUERY = ("window", "merge")


def build_positional_index(
    sf_dir: str, num_buckets: int = INDEX_BUCKETS
) -> str:
    """Positional posting store: (term, doc_id, positions list<int32>),
    bucket-partitioned by crc32(term) — the phrase-capable sibling of
    build_inverted_index (postings carry occurrence positions, so the
    index is O(total tokens) rather than O(distinct pairs): the standard
    positional-index storage trade)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/fr_posidx/{tag}-b{num_buckets}-v1"
    fp = source_fingerprint(
        f"{sf_dir}/documents.parquet", extra=f"pos-b{num_buckets}-v1"
    )
    if cache_valid(out, fp):
        return out
    os.makedirs(out, exist_ok=True)

    def postings(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        terms, docs, positions = [], [], []
        for doc_id, ts in zip(df["doc_id"], toks):
            pos: dict[str, list[int]] = {}
            for i, t in enumerate(ts):
                pos.setdefault(t, []).append(i)
            for t, ps in pos.items():
                terms.append(t)
                docs.append(int(doc_id))
                positions.append(ps)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(docs, pa.int64()),
                "positions": pa.array(positions, pa.list_(pa.int32())),
                "bucket": pa.array(
                    [zlib.crc32(t.encode("utf-8")) % num_buckets for t in terms],
                    pa.int32(),
                ),
            }
        )

    (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(postings, batch_format="pandas")
        .write_parquet(out, partition_cols=["bucket"])
    )
    mark_done(out, fp)
    return out


def phrase_search(sf_dir: str, phrase=PHRASE_QUERY) -> pd.DataFrame:
    """Exact-phrase retrieval via the positional index: doc_ids where the
    query terms occur at CONSECUTIVE token positions, plus the match
    count. Reads only the query terms' bucket partitions; the adjacency
    join (pos(t_{i+1}) ∩ (pos(t_i)+1)) runs where the postings live."""
    import glob as _glob

    import numpy as np

    index_dir = build_positional_index(sf_dir)
    phrase = [t.lower() for t in phrase]
    by_bucket: dict[int, list[str]] = {}
    for t in set(phrase):
        by_bucket.setdefault(
            zlib.crc32(t.encode("utf-8")) % INDEX_BUCKETS, []
        ).append(t)

    @ray.remote(num_cpus=1)
    def read_positions(files: list[str], wanted: list[str]):
        import pyarrow.parquet as pq

        t = pq.read_table(files, columns=["term", "doc_id", "positions"])
        t = t.filter(pc.is_in(t.column("term"), value_set=pa.array(wanted)))
        out: dict[str, dict[int, np.ndarray]] = {}
        for term, doc, ps in zip(
            t.column("term").to_pylist(),
            t.column("doc_id").to_pylist(),
            t.column("positions").to_pylist(),
        ):
            out.setdefault(term, {})[doc] = np.asarray(ps, dtype=np.int64)
        return out

    refs = []
    for b, wanted in sorted(by_bucket.items()):
        files = sorted(
            _glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet"))
        )
        if files:
            refs.append(read_positions.remote(files, sorted(wanted)))
    pos: dict[str, dict[int, "np.ndarray"]] = {}
    for part in ray.get(refs):
        for term, m in part.items():
            pos.setdefault(term, {}).update(m)
    if any(t not in pos for t in phrase):
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "n_matches": pd.Series([], dtype="int64")}
        )
    docs = set(pos[phrase[0]])
    for t in phrase[1:]:
        docs &= set(pos[t])
    rows = []
    for d in sorted(docs):
        starts = pos[phrase[0]][d]
        for off, t in enumerate(phrase[1:], 1):
            nxt = pos[t][d]
            starts = starts[np.isin(starts + off, nxt)]
            if len(starts) == 0:
                break
        if len(starts):
            rows.append((d, len(starts)))
    return pd.DataFrame(
        {"doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
         "n_matches": pd.Series([r[1] for r in rows], dtype="int64")}
    )


def phrase_search_sql(phrase=PHRASE_QUERY) -> str:
    conds = " AND ".join(
        f"w[i + {off}] = '{t}'"
        for off, t in enumerate(_sql_safe_terms(phrase, allow_dup=True))
    )
    return rf"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM documents
), m AS (
  SELECT doc_id,
         len(list_filter(range(1, len(w) - {len(phrase) - 1} + 1),
             i -> {conds}))::BIGINT AS n_matches
  FROM t
)
SELECT doc_id, n_matches FROM m WHERE n_matches > 0 ORDER BY doc_id
"""


PHRASE_SEARCH_SQL = phrase_search_sql()


# ------------------------------------------------- boolean OR / AND NOT
# The remaining boolean-retrieval connectives over the same
# bucket-partitioned postings: docs matching (t1 OR t2) AND NOT t3 — the
# classic filtered-disjunction query (include synonyms, exclude a
# poisoning term). Point-reads only the query terms' bucket partitions
# like search_and; the NOT term's postings are a subtraction set, NEVER a
# corpus scan (critically: NOT is evaluated against the OR hit set, not
# against the corpus, so the work is bounded by the query postings).
SEARCH_OR_TERMS = ("window", "merge")
SEARCH_NOT_TERM = "scan"


def search_or_not(
    sf_dir: str, or_terms=SEARCH_OR_TERMS, not_term: str = SEARCH_NOT_TERM
) -> pd.DataFrame:
    """doc_ids containing ANY of ``or_terms`` and NOT ``not_term``."""
    import glob as _glob

    index_dir = build_inverted_index(sf_dir)
    terms = sorted({t.lower() for t in or_terms} | {not_term.lower()})
    by_bucket: dict[int, list[str]] = {}
    for t in terms:
        by_bucket.setdefault(
            zlib.crc32(t.encode("utf-8")) % INDEX_BUCKETS, []
        ).append(t)

    @ray.remote(num_cpus=1)
    def read_postings(files: list[str], wanted: list[str]):
        import pyarrow.parquet as pq

        t = pq.read_table(files, columns=["term", "doc_id"])
        t = t.filter(pc.is_in(t.column("term"), value_set=pa.array(wanted)))
        out = {}
        for term, doc in zip(
            t.column("term").to_pylist(), t.column("doc_id").to_pylist()
        ):
            out.setdefault(term, set()).add(doc)
        return out

    refs = []
    for b, wanted in sorted(by_bucket.items()):
        files = sorted(
            _glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet"))
        )
        if files:
            refs.append(read_postings.remote(files, sorted(wanted)))
    posting: dict[str, set] = {}
    for part in ray.get(refs):
        for term, docs in part.items():
            posting.setdefault(term, set()).update(docs)
    hit = set.union(*(posting.get(t.lower(), set()) for t in or_terms))
    hit -= posting.get(not_term.lower(), set())
    return pd.DataFrame({"doc_id": sorted(hit)}).astype({"doc_id": "int64"})


def search_or_not_sql(or_terms=SEARCH_OR_TERMS, not_term: str = SEARCH_NOT_TERM) -> str:
    ors = " OR ".join(
        f"list_contains(regexp_extract_all(lower(text), '\\S+'), '{t}')"
        for t in _sql_safe_terms(or_terms)
    )
    (nt,) = _sql_safe_terms([not_term])
    return f"""
SELECT doc_id FROM documents
WHERE ({ors})
  AND NOT list_contains(regexp_extract_all(lower(text), '\\S+'), '{nt}')
ORDER BY doc_id
"""


SEARCH_OR_NOT_SQL = search_or_not_sql()


# --------------------------------------------------- hybrid RRF retrieval
RRF_C = 60  # the standard reciprocal-rank-fusion constant (Cormack 2009)
RRF_POOL = 20  # per-ranker candidate pool
RRF_K = 10  # fused results returned


def hybrid_rrf_topk(
    sf_dir: str, terms=BM25_QUERY, k: int = RRF_K,
    pool: int = RRF_POOL, c: int = RRF_C,
) -> "pd.DataFrame":
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    ranking (query ``terms``) and the embedding-cosine semantic ranking
    (query = vector 0, the corpus convention of ann.brute_force_topk;
    vec_id ≡ doc_id in the synthetic corpus). rrf(d) = Σ 1/(c + rank_d)
    over the rankers that retrieved d — the score-free fusion that needs
    no cross-ranker calibration, which is why production hybrid search
    uses it.

    Scale shape: both rankers are the already-scale-shaped operators
    (BM25: one stats pass + per-block top-k combiners; cosine: streamed
    block matmuls against a broadcast query) — each returns a POOL-sized
    list, and fusion is arithmetic on two pool-sized tables. Nothing new
    crosses an exchange."""
    import numpy as np

    from ..pipelines.analytics import r2
    from .ann import brute_force_topk

    lex = bm25_topk(sf_dir, terms, k=pool)  # rank, doc_id, score
    sem = brute_force_topk(sf_dir, k=pool, n_queries=1)  # query 0 only
    lexm = dict(zip(lex["doc_id"], lex["rank"]))
    semm = dict(zip(sem["neighbor_id"], sem["rank"]))
    rows = []
    for d in sorted(set(lexm) | set(semm)):
        lt = 1.0 / (c + lexm[d]) if d in lexm else 0.0
        st = 1.0 / (c + semm[d]) if d in semm else 0.0
        rows.append(
            {
                "doc_id": int(d),
                "rrf_score": float(r2(lt + st, 6)),
                "bm25_rank": float(lexm.get(d, np.nan)),
                "cos_rank": float(semm.get(d, np.nan)),
            }
        )
    out = (
        pd.DataFrame(rows)
        .sort_values(["rrf_score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out.insert(0, "rank", pd.Series(range(1, len(out) + 1), dtype="int64"))
    return out


def hybrid_rrf_sql(
    terms=BM25_QUERY, k: int = RRF_K, pool: int = RRF_POOL, c: int = RRF_C,
    k1: float = BM25_K1, b: float = BM25_B,
) -> str:
    terms = _sql_safe_terms(terms)
    per_term = " + ".join(
        f"""(ln((s.n_docs - d.df_{t} + 0.5) / (d.df_{t} + 0.5) + 1.0)
   * (t.tf_{t} * ({k1} + 1))
   / (t.tf_{t} + {k1} * (1 - {b} + {b} * t.dl / s.avgdl)))"""
        for t in terms
    )
    tf_cols = ",\n         ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::DOUBLE AS tf_{t}"
        for t in terms
    )
    df_cols = ", ".join(
        f"count(*) FILTER (tf_{t} > 0)::BIGINT AS df_{t}" for t in terms
    )
    return f"""
WITH t AS (
  SELECT doc_id, len(toks)::DOUBLE AS dl,
         {tf_cols}
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS toks
        FROM documents)
), s AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM t
), d AS (
  SELECT {df_cols} FROM t
), scored AS (
  SELECT t.doc_id, ROUND({per_term}, 6) AS score FROM t, s, d
), lex AS (
  SELECT ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r, doc_id
  FROM scored WHERE score > 0 ORDER BY score DESC, doc_id LIMIT {pool}
), q AS (
  SELECT embedding FROM embeddings WHERE vec_id = 0
), sims AS (
  SELECT e.vec_id AS doc_id,
         list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cr
  FROM q, embeddings e WHERE e.vec_id <> 0
), sem AS (
  SELECT ROW_NUMBER() OVER (ORDER BY cr DESC, doc_id) AS r, doc_id
  FROM sims ORDER BY cr DESC, doc_id LIMIT {pool}
), fused AS (
  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         ROUND(COALESCE(1.0 / ({c} + lex.r), 0)
               + COALESCE(1.0 / ({c} + sem.r), 0), 6) AS rrf_score,
         lex.r::DOUBLE AS bm25_rank, sem.r::DOUBLE AS cos_rank
  FROM lex FULL OUTER JOIN sem ON sem.doc_id = lex.doc_id
)
SELECT ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id)::BIGINT AS rank,
       doc_id, rrf_score, bm25_rank, cos_rank
FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {k}
"""


HYBRID_RRF_SQL = hybrid_rrf_sql()
