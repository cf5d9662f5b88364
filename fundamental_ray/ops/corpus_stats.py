"""Corpus-level statistics operators for training-data pipelines: vocabulary
document-frequency top-k, Gopher-style quality-rule filtering, fixed-stride
token-window chunking, and per-document TF-IDF top terms.

These extend the text family (ops/text.py — the reference's per-record
string processing of funda_spider.py / pipelines.py lifted to corpus scale,
SURVEY.md §2.10) with the CROSS-document statistics a pre-training data
pipeline needs. Scale shapes:

- ``vocab_topk``: per-batch partial (term → df, tf) fold inside
  ``map_batches`` (the combiner), then ONE small ``groupby('term').sum``
  exchange of at most vocab × n_blocks rows — never a row per token.
- ``gopher_filter``: embarrassingly parallel vectorized map_batches.
- ``chunk_windows``: pure fan-out map_batches (rows out > rows in); no
  shuffle at all — chunk rows stream straight to the consumer.
- ``tfidf_topterms``: two passes — distributed DF aggregation (same
  combiner as vocab_topk, WITHOUT the top-k cut), broadcast of the
  (vocab-sized) DF table via ``ray.put`` once, then a per-batch scoring
  pass. Assumes the vocabulary fits in a worker's heap (true for natural
  language at any corpus size: vocab grows ~ Heaps' law, sublinearly; a
  100-TB web corpus's useful vocab is ~10^7 terms ≈ a few hundred MB as a
  hash map — the classic broadcast-small-side trade).
"""

from __future__ import annotations
from fundamental_ray.sources.parquet import read_parquet_clean

import hashlib
import os

import numpy as np
import pandas as pd
import ray
import ray.data

from .text import WORD_RE

# ---------------------------------------------------------------- helpers


def _read_docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=columns or ["doc_id", "text"]
    )


def _partial_term_counts(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch combiner: (term, partial document frequency, partial term
    frequency). Documents are never split across batches, so per-batch df
    partials sum to the exact corpus df.

    Vectorized (ops/text.flat_tokens + factorize/bincount): tf is a code
    bincount; df counts distinct (doc, code) pairs via one np.unique over
    packed int64 keys — no Python token loop (VERDICT r4 #3)."""
    from .text import flat_tokens

    import pyarrow as pa

    toks, doc = flat_tokens(df["text"])
    if len(toks) == 0:
        return pa.table(
            {"term": pa.array([], pa.string()),
             "df_part": pa.array([], pa.int64()),
             "tf_part": pa.array([], pa.int64())}
        )
    codes, uniq = pd.factorize(toks)
    v = len(uniq)
    tf = np.bincount(codes, minlength=v).astype(np.int64)
    pair_codes = np.unique(doc * np.int64(v) + codes) % v
    dfreq = np.bincount(pair_codes, minlength=v).astype(np.int64)
    order = np.argsort(uniq)
    # Arrow out: pandas-born object-dtype blocks carry unhashable schema
    # metadata into the aggregate exchange (the repo-wide slow path)
    return pa.table(
        {
            "term": pa.array(uniq[order], pa.string()),
            "df_part": pa.array(dfreq[order]),
            "tf_part": pa.array(tf[order]),
        }
    )


# (abspath, source fingerprint) -> (term, df, tf) pandas result. The term
# stats are vocab-bounded (Heaps' law — ~31 terms on this corpus, low
# millions at 100 TB) and consumed by SEVEN ops (vocab, unigram LM, pmi,
# perplexity, tfidf, dsir, fuzzy); without the memo each of them pays the
# full corpus scan + exchange (~1-4 s of Ray fixed cost at sf0.1, the
# actual wall-clock line VERDICT r4 flagged as "tokenization"). Keyed by
# content fingerprint, so an in-place corpus rewrite invalidates.
_TERM_STATS_MEMO: dict = {}


def _corpus_term_stats_df(sf_dir: str) -> pd.DataFrame:
    """(term, df, tf) pandas frame, fingerprint-memoized per corpus."""
    from fundamental_ray.state.diskcache import source_fingerprint

    from ray.data.aggregate import Sum

    key = (
        os.path.abspath(sf_dir),
        source_fingerprint(f"{sf_dir}/documents.parquet"),
    )
    if key not in _TERM_STATS_MEMO:
        _TERM_STATS_MEMO[key] = (
            _read_docs(sf_dir)
            .map_batches(_partial_term_counts, batch_format="pandas")
            .groupby("term")
            .aggregate(
                Sum("df_part", alias_name="df"), Sum("tf_part", alias_name="tf")
            )
            .to_pandas()
            .astype({"df": "int64", "tf": "int64"})
            .sort_values("term")
            .reset_index(drop=True)
        )
    return _TERM_STATS_MEMO[key]


def _corpus_term_stats(sf_dir: str) -> ray.data.Dataset:
    """Distributed (term, df, tf) over the whole corpus: combiner inside
    map_batches, one groupby-sum exchange over vocab-sized partials —
    memoized (see _corpus_term_stats_df) and re-wrapped as a Dataset for
    the sort/limit consumers."""
    return ray.data.from_pandas(_corpus_term_stats_df(sf_dir))


# ------------------------------------------------------------- vocab_topk
VOCAB_TOPK = 20  # synthetic corpus vocab is ~31 terms; 20 keeps the cut real


def vocab_topk(sf_dir: str, k: int = VOCAB_TOPK) -> pd.DataFrame:
    """Top-k vocabulary terms by document frequency (ties → term asc).
    The whole-corpus token stream never crosses an exchange: only the
    per-block vocab partials do."""
    out = (
        _corpus_term_stats(sf_dir)
        .sort(["df", "term"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out["df"] = out["df"].astype("int64")
    out["tf"] = out["tf"].astype("int64")
    return out[["term", "df", "tf"]]


VOCAB_TOPK_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
), per_doc AS (
  SELECT term, doc_id, count(*) AS tf_doc FROM toks GROUP BY term, doc_id
)
SELECT term, count(*)::BIGINT AS df, sum(tf_doc)::BIGINT AS tf
FROM per_doc GROUP BY term
ORDER BY df DESC, term LIMIT {VOCAB_TOPK}
"""


# ---------------------------------------------------------- gopher_filter
# Gopher-style quality rules (Rae et al. 2021, table A1 adapted to this
# corpus's single-line synthetic text): doc length in words, mean word
# length band, and a minimum distinct-word diversity.
G_MIN_WORDS, G_MAX_WORDS = 20, 90
G_MIN_MWL, G_MAX_MWL = 3.0, 10.0
G_MIN_DISTINCT_RATIO = 0.2  # distinct words / words


def gopher_metrics(toks: pd.Series):
    """(n_words, mean word length, distinct ratio) for a Series of token
    lists — the shared kernel of gopher_filter and pipelines/clean.py."""
    n_words = toks.map(len).to_numpy(dtype=np.int64)
    mwl = np.array(
        [float(np.mean([len(t) for t in ts])) if ts else 0.0 for ts in toks]
    )
    dr = np.array([len(set(ts)) / len(ts) if ts else 0.0 for ts in toks])
    return n_words, mwl, dr


def gopher_rules(n_words, mwl, dr):
    """The rule conjunction over gopher_metrics outputs."""
    return (
        (n_words >= G_MIN_WORDS) & (n_words <= G_MAX_WORDS)
        & (mwl >= G_MIN_MWL) & (mwl <= G_MAX_MWL)
        & (dr >= G_MIN_DISTINCT_RATIO)
    )


def gopher_filter(sf_dir: str) -> pd.DataFrame:
    """Per-document quality-rule flags + the conjunction, for EVERY doc
    (the downstream filter is `WHERE passes` — kept as flags so the
    rejected set is auditable, which is how production pipelines ship)."""
    from ..pipelines.analytics import r2

    def f(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        n_words, mwl, distinct_ratio = gopher_metrics(toks)
        rule_wc = (n_words >= G_MIN_WORDS) & (n_words <= G_MAX_WORDS)
        rule_mwl = (mwl >= G_MIN_MWL) & (mwl <= G_MAX_MWL)
        rule_div = distinct_ratio >= G_MIN_DISTINCT_RATIO
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_words": n_words,
                "mean_word_len": r2(mwl, 4),
                "distinct_ratio": r2(distinct_ratio, 4),
                "rule_wordcount": rule_wc,
                "rule_mean_word_len": rule_mwl,
                "rule_diversity": rule_div,
                "passes": rule_wc & rule_mwl & rule_div,
            }
        )

    return (
        _read_docs(sf_dir)
        .map_batches(f, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


GOPHER_FILTER_SQL = rf"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_words,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                   / len(toks) END AS mwl,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE len(list_distinct(toks))::DOUBLE / len(toks) END AS dr
  FROM t
)
SELECT doc_id, n_words,
       ROUND(mwl, 4) AS mean_word_len,
       ROUND(dr, 4) AS distinct_ratio,
       (n_words BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS}) AS rule_wordcount,
       (mwl >= {G_MIN_MWL} AND mwl <= {G_MAX_MWL}) AS rule_mean_word_len,
       (dr >= {G_MIN_DISTINCT_RATIO}) AS rule_diversity,
       ((n_words BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS})
        AND mwl >= {G_MIN_MWL} AND mwl <= {G_MAX_MWL}
        AND dr >= {G_MIN_DISTINCT_RATIO}) AS passes
FROM m ORDER BY doc_id
"""


# ---------------------------------------------------------- chunk_windows
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def chunk_windows(
    sf_dir: str, chunk: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> pd.DataFrame:
    """Fixed-stride token windows (the training-sample packing primitive):
    each document fans out to ⌈n_tok / stride⌉ overlapping chunks of up to
    ``chunk`` tokens. Pure map-side fan-out — no shuffle; at 100 TB the
    chunk rows stream block-by-block to the sink. Chunk text is the
    space-joined token slice (tokenization canonicalizes whitespace)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "chunk_idx": [], "start_tok": [], "n_tok": [],
               "chunk_text": []}
        for doc_id, text in zip(df["doc_id"], df["text"].fillna("")):
            ts = WORD_RE.findall(text)
            n = len(ts)
            start, idx = 0, 0
            while start < n:
                piece = ts[start : start + chunk]
                out["doc_id"].append(doc_id)
                out["chunk_idx"].append(idx)
                out["start_tok"].append(start)
                out["n_tok"].append(len(piece))
                out["chunk_text"].append(" ".join(piece))
                start += stride
                idx += 1
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "chunk_idx": pd.Series(out["chunk_idx"], dtype="int64"),
                "start_tok": pd.Series(out["start_tok"], dtype="int64"),
                "n_tok": pd.Series(out["n_tok"], dtype="int64"),
                "chunk_text": pd.Series(out["chunk_text"], dtype="object"),
            }
        )

    return (
        _read_docs(sf_dir)
        .map_batches(f, batch_format="pandas")
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )


CHUNK_WINDOWS_SQL = rf"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
  FROM documents
), starts AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS s
  FROM t WHERE len(toks) > 0
)
SELECT doc_id,
       (s // {CHUNK_STRIDE})::BIGINT AS chunk_idx,
       s::BIGINT AS start_tok,
       (LEAST(s + {CHUNK_TOKENS}, len(toks)) - s)::BIGINT AS n_tok,
       array_to_string(toks[s + 1 : LEAST(s + {CHUNK_TOKENS}, len(toks))], ' ')
         AS chunk_text
FROM starts
ORDER BY doc_id, chunk_idx
"""


# --------------------------------------------------------- tfidf_topterms
TFIDF_TOP = 3


def tfidf_topterms(sf_dir: str, k: int = TFIDF_TOP) -> pd.DataFrame:
    """Per-document top-k terms by TF-IDF (idf = ln(N/df), reported
    rounded to 4 dp). The RANKING key is the integer total order
    (tf desc, df asc, term asc) — consistent with tf·idf up to cross-term
    float ties, and chosen over sorting the float score itself because
    libm ``ln`` is not ulp-reproducible across engines (a 1-ulp
    difference between numpy and the SQL oracle could swap two
    near-equal scores). Pass 1 computes the corpus DF table distributed
    and broadcasts it ONCE (``ray.put``); pass 2 scores each document's
    terms against the broadcast map inside map_batches — the corpus
    crosses no exchange."""
    from ..pipelines.analytics import r2

    n_docs = _read_docs(sf_dir, columns=["doc_id"]).count()

    # distributed DF: same combiner as vocab_topk, df only
    def partial_df(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        dfreq: dict[str, int] = {}
        for ts in toks:
            for t in set(ts):
                dfreq[t] = dfreq.get(t, 0) + 1
        terms = sorted(dfreq)
        return pd.DataFrame(
            {"term": terms,
             "df_part": np.array([dfreq[t] for t in terms], dtype=np.int64)}
        )

    from ray.data.aggregate import Sum

    df_tbl = (
        _read_docs(sf_dir)
        .map_batches(partial_df, batch_format="pandas")
        .groupby("term")
        .aggregate(Sum("df_part", alias_name="df"))
        .to_pandas()
    )
    df_ref = ray.put(dict(zip(df_tbl["term"], df_tbl["df"].astype(np.int64))))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dfm = ray.get(df_ref)
        out = {"doc_id": [], "term": [], "rank": [], "tfidf": []}
        for doc_id, text in zip(df["doc_id"], df["text"].fillna("")):
            ts = [t for t in WORD_RE.findall(text.lower())]
            if not ts:
                continue
            tf: dict[str, int] = {}
            for t in ts:
                tf[t] = tf.get(t, 0) + 1
            scored = sorted(
                ((-cnt, dfm[t], t) for t, cnt in tf.items())
            )[:k]
            for r, (neg_tf, dft, t) in enumerate(scored, 1):
                out["doc_id"].append(doc_id)
                out["term"].append(t)
                out["rank"].append(r)
                out["tfidf"].append(float(-neg_tf) * np.log(n_docs / dft))
        res = pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "term": pd.Series(out["term"], dtype="object"),
                "rank": pd.Series(out["rank"], dtype="int64"),
                "tfidf": r2(np.array(out["tfidf"], dtype=np.float64), 4),
            }
        )
        return res

    return (
        _read_docs(sf_dir)
        .map_batches(score, batch_format="pandas")
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )


TFIDF_TOPTERMS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term
), dft AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term
), n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(n.n_docs / dft.df) AS tfidf_raw,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, dft.df ASC, tf.term
         ) AS rank
  FROM tf JOIN dft USING (term), n
)
SELECT doc_id, term, rank::BIGINT AS rank, ROUND(tfidf_raw, 4) AS tfidf
FROM scored WHERE rank <= {TFIDF_TOP}
ORDER BY doc_id, rank
"""


# -------------------------------------------------- vocab_heavy_hitters
# the SKETCH twin of vocab_topk (the ivf_topk : brute_force_topk
# relationship): when the vocabulary does NOT fit in a worker's heap —
# adversarial corpora, n-gram vocabularies — exact per-batch (term → tf)
# maps are unusable. Misra-Gries summaries are constant-size and
# mergeable: any term with global frequency > N_batch/capacity survives
# its batch's summary (pigeonhole), so the union of per-batch summaries
# has full recall on global heavy hitters, and a second exact counting
# pass over the candidate set alone makes the final counts exact.
MG_CAPACITY = 64


def _misra_gries(terms_iter, capacity: int) -> dict[str, int]:
    """Classic Misra-Gries: at most ``capacity`` counters; decrement all
    when full. Surviving counts are lower bounds within N/capacity."""
    counters: dict[str, int] = {}
    for t in terms_iter:
        if t in counters:
            counters[t] += 1
        elif len(counters) < capacity:
            counters[t] = 1
        else:
            dead = [k for k in counters if counters[k] == 1]
            for k in counters:
                counters[k] -= 1
            for k in dead:
                del counters[k]
    return counters


def vocab_heavy_hitters(
    sf_dir: str, k: int = VOCAB_TOPK, capacity: int = MG_CAPACITY
) -> pd.DataFrame:
    """Top-k terms by TOTAL frequency via the two-pass sketch: (1)
    per-batch Misra-Gries summaries (≤ capacity rows leave each batch —
    constant, vocab-independent), merged by a small groupby; (2) exact
    recount of ONLY the candidate terms (broadcast set, per-batch
    vectorized isin count, groupby sum), then top-k with deterministic
    ties (tf desc, term asc). Exact whenever the true k-th frequency
    exceeds N/capacity — test-asserted at this corpus, same
    empirically-exact-at-registered-width contract as ann_ivf/ann_lsh.
    Also emits df for each winner (computed in the same second pass)."""
    from ray.data.aggregate import Sum

    def pass1(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        mg = _misra_gries((t for ts in toks for t in ts), capacity)
        terms = sorted(mg)
        return pd.DataFrame(
            {"term": terms,
             "lb": np.array([mg[t] for t in terms], dtype=np.int64)}
        )

    cand_tbl = (
        _read_docs(sf_dir)
        .map_batches(pass1, batch_format="pandas")
        .groupby("term")
        .aggregate(Sum("lb", alias_name="lb"))
        .to_pandas()
    )
    cand_ref = ray.put(set(cand_tbl["term"]))

    def pass2(df: pd.DataFrame) -> pd.DataFrame:
        cand = ray.get(cand_ref)
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        tf: dict[str, int] = {}
        dfreq: dict[str, int] = {}
        for ts in toks:
            seen_doc = set()
            for t in ts:
                if t in cand:
                    tf[t] = tf.get(t, 0) + 1
                    seen_doc.add(t)
            for t in seen_doc:
                dfreq[t] = dfreq.get(t, 0) + 1
        terms = sorted(tf)
        return pd.DataFrame(
            {"term": terms,
             "tf_part": np.array([tf[t] for t in terms], dtype=np.int64),
             "df_part": np.array([dfreq[t] for t in terms], dtype=np.int64)}
        )

    out = (
        _read_docs(sf_dir)
        .map_batches(pass2, batch_format="pandas")
        .groupby("term")
        .aggregate(Sum("tf_part", alias_name="tf"), Sum("df_part", alias_name="df"))
        .sort(["tf", "term"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out["tf"] = out["tf"].astype("int64")
    out["df"] = out["df"].astype("int64")
    return out[["term", "tf", "df"]]


VOCAB_HEAVY_HITTERS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
), per_doc AS (
  SELECT term, doc_id, count(*) AS tf_doc FROM toks GROUP BY term, doc_id
)
SELECT term, sum(tf_doc)::BIGINT AS tf, count(*)::BIGINT AS df
FROM per_doc GROUP BY term
ORDER BY tf DESC, term LIMIT {VOCAB_TOPK}
"""


# ----------------------------------------------------- unigram_logprob
# Unigram language-model scoring: per-document mean log-probability under
# the corpus's own unigram distribution — the cheap LM-based quality
# signal (CCNet-style) between heuristic rules (gopher_filter) and a real
# model. Two passes, same shape as tfidf_topterms: distributed (term → tf)
# aggregation (combiner inside map_batches; vocab-sized partials cross the
# one exchange), ONE ray.put broadcast of {term: tf}, then a per-batch
# scoring pass — the corpus itself crosses no exchange.
# Float contract: the reported score is ROUND(mean(ln(tf/N)), 6); ln values
# are O(−5..−13) and per-doc token counts are O(100), so cross-engine libm
# ulps and summation-order drift sit ~9 orders below the rounding quantum.


def unigram_logprob(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Sum

    from ..pipelines.analytics import r2

    def partial_tf(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        tf: dict[str, int] = {}
        for ts in toks:
            for t in ts:
                tf[t] = tf.get(t, 0) + 1
        terms = sorted(tf)
        return pd.DataFrame(
            {"term": terms,
             "tf_part": np.array([tf[t] for t in terms], dtype=np.int64)}
        )

    tf_tbl = (
        _read_docs(sf_dir)
        .map_batches(partial_tf, batch_format="pandas")
        .groupby("term")
        .aggregate(Sum("tf_part", alias_name="tf"))
        .to_pandas()  # vocab-sized (Heaps' law — see module docstring)
    )
    n_total = float(tf_tbl["tf"].sum())
    lp = dict(
        zip(tf_tbl["term"], np.log(tf_tbl["tf"].to_numpy(np.float64) / n_total))
    )
    lp_ref = ray.put(lp)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(lp_ref)
        df = df.reset_index(drop=True)
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        n_tokens = toks.str.len().to_numpy(np.int64)
        # vectorized: explode to one token row, dict-map, per-doc mean
        ex = toks.explode().dropna()
        means = ex.map(table).groupby(level=0).mean()
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_tokens": n_tokens,
                "logprob": r2(means.reindex(df.index).to_numpy(np.float64), 6),
            }
        )
        return out[out["n_tokens"] > 0]

    return (
        _read_docs(sf_dir)
        .map_batches(score, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


UNIGRAM_LOGPROB_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
), tf AS (
  SELECT term, count(*) AS tf FROM toks GROUP BY term
), nn AS (
  SELECT count(*)::DOUBLE AS n FROM toks
)
SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
       ROUND(AVG(ln(tf.tf / (SELECT n FROM nn))), 6) AS logprob
FROM toks t JOIN tf USING (term)
GROUP BY t.doc_id
"""


# --------------------------------------------------------------------------
# Per-language Shannon entropy of the unigram distribution — the lexical
# diversity statistic (nats/token) corpus audits report per stratum.
# H = ln(T) − Σ tf·ln(tf) / T decomposes over per-(lang, term) counts, so
# the whole computation is the vocab_topk combiner shape: per-batch
# (lang, term → tf) partials, ONE map-side-combined groupby to exact tfs,
# then a per-lang reduction of (tf·ln tf, tf) partials — corpus text
# crosses no exchange, only vocab-sized rows do. 6-dp rounding absorbs
# float summation-order drift (tf·ln tf terms are O(tf·ln tf) ≤ 1e7 at
# corpus scale while the ROUND grid is 0.5e-6 of an O(10) value... the
# drift of a Σ of ~1e5 such doubles is ~1e-9 absolute).


def lang_entropy(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Sum

    from ..pipelines.analytics import r2

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        rows: dict[tuple[str, str], int] = {}
        for lang, ts in zip(df["lang"], toks):
            for t in ts:
                rows[(lang, t)] = rows.get((lang, t), 0) + 1
        keys = sorted(rows)
        return pd.DataFrame(
            {
                "lang": [k[0] for k in keys],
                "term": [k[1] for k in keys],
                "tf": np.array([rows[k] for k in keys], dtype=np.int64),
            }
        )

    tf = (
        _read_docs(sf_dir, columns=["doc_id", "text", "lang"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["lang", "term"])
        .aggregate(Sum("tf", alias_name="tf"))
    )

    def lang_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["tf"].to_numpy(np.float64)
        out = pd.DataFrame({"lang": df["lang"], "sx": t * np.log(t), "t": t})
        return out.groupby("lang", as_index=False).sum()

    agg = (
        tf.map_batches(lang_partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("sx", alias_name="sx"), Sum("t", alias_name="t"))
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "lang": agg["lang"],
            "n_tokens": agg["t"].astype("int64"),
            "entropy": r2(np.log(agg["t"].to_numpy(np.float64)) - agg["sx"] / agg["t"], 6),
        }
    ).sort_values("lang").reset_index(drop=True)


LANG_ENTROPY_SQL = r"""
WITH tok AS (
  SELECT lang,
         unnest(regexp_extract_all(lower(COALESCE(text, '')), '\S+')) AS term
  FROM documents
), tf AS (
  SELECT lang, term, COUNT(*)::DOUBLE AS tf FROM tok GROUP BY lang, term
)
SELECT lang, SUM(tf)::BIGINT AS n_tokens,
       ROUND(ln(SUM(tf)) - SUM(tf * ln(tf)) / SUM(tf), 6) AS entropy
FROM tf GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, "Data Selection for Language
# Models via Importance Resampling"): score every raw document by the
# log-likelihood ratio of HASHED n-gram features under the target
# distribution vs the raw distribution — the standard cheap "does this look
# like my target domain" signal for pretraining-data selection. Target
# slice here: lang='en' documents of the same corpus (in production: the
# high-quality reference corpus).
#
# Scale shape (the reason DSIR hashes): feature space is a FIXED 4096
# buckets, so pass 1 is a per-batch (bucket → raw count, target count)
# combiner + ONE map-side-combined groupby to a 4096-row table; the
# Laplace-smoothed log-ratio table is a 4096-float ray.put broadcast; and
# pass 2 scores each doc locally (md5 per UNIQUE gram per batch, vectorized
# gather + segment sum). Corpus text never crosses an exchange, and unlike
# vocab-dict approaches the broadcast is constant-size at 100 TB.
# Hash = first 8 md5 hex chars % 4096 (DuckDB-recomputable, the repo's
# standard reproducible-hash idiom). Grams = word unigrams + bigrams over
# the lowercased space-split text.

DSIR_BUCKETS = 4096
DSIR_TARGET_LANG = "en"


def _dsir_grams(texts: pd.Series) -> pd.Series:
    """Per-row list of unigram+bigram strings (lowercased)."""
    words = texts.fillna("").str.lower().str.split(" ")
    return words.map(
        lambda ws: ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    )


def _dsir_buckets(ex: pd.Series) -> np.ndarray:
    """md5-bucket of each gram; hashes computed once per unique gram."""
    uniq, inv = np.unique(ex.to_numpy(dtype=object), return_inverse=True)
    uh = np.array(
        [
            int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) % DSIR_BUCKETS
            for g in uniq
        ],
        dtype=np.int64,
    )
    return uh[inv]


def _dsir_partial_counts(df: pd.DataFrame) -> pd.DataFrame:
    """(b, c_raw, c_tgt) bucket partials for one batch slice."""
    grams = _dsir_grams(df["text"])
    ex = grams.explode().dropna()
    if not len(ex):
        return pd.DataFrame(
            {"b": pd.Series([], dtype="int64"),
             "c_raw": pd.Series([], dtype="int64"),
             "c_tgt": pd.Series([], dtype="int64")}
        )
    b = _dsir_buckets(ex)
    is_tgt = (
        (df["lang"] == DSIR_TARGET_LANG)
        .reindex(ex.index)
        .to_numpy(dtype=bool)
        .astype(np.int64)
    )
    out = (
        pd.DataFrame({"b": b, "c_raw": 1, "c_tgt": is_tgt})
        .groupby("b", as_index=False)
        .sum()
    )
    return out.astype({"b": "int64", "c_raw": "int64", "c_tgt": "int64"})


def _dsir_lw_table(cnt: pd.DataFrame) -> np.ndarray:
    """Laplace-smoothed log-ratio table (DSIR_BUCKETS floats) from the
    folded (b, c_raw, c_tgt) counts."""
    t_raw = float(cnt["c_raw"].sum())
    t_tgt = float(cnt["c_tgt"].sum())
    lw = np.zeros(DSIR_BUCKETS, dtype=np.float64)
    lw[cnt["b"].to_numpy(np.int64)] = np.log(
        (cnt["c_tgt"].to_numpy(np.float64) + 1.0) / (t_tgt + DSIR_BUCKETS)
    ) - np.log((cnt["c_raw"].to_numpy(np.float64) + 1.0) / (t_raw + DSIR_BUCKETS))
    return lw


def _dsir_sums(df: pd.DataFrame, table: np.ndarray) -> np.ndarray:
    """Per-row sum of bucket log-ratios over the row's grams."""
    grams = _dsir_grams(df["text"])
    ex = grams.explode().dropna()
    if not len(ex):
        return np.zeros(len(df), dtype=np.float64)
    b = _dsir_buckets(ex)
    return (
        pd.Series(table[b], index=ex.index).groupby(level=0).sum()
        .reindex(df.index, fill_value=0.0)
        .to_numpy(np.float64)
    )


def dsir_weights(sf_dir: str) -> pd.DataFrame:
    from ..pipelines.analytics import r2

    cnt = (
        _read_docs(sf_dir, columns=["doc_id", "text", "lang"])
        .map_batches(_dsir_partial_counts, batch_format="pandas")
        .to_pandas()  # ≤ DSIR_BUCKETS × n_blocks rows — constant-bounded
        .groupby("b", as_index=False)
        .sum()  # driver fold, the kmeans-partials idiom (a Ray groupby
        # here would pay a full sort exchange for a constant-size table)
    )
    lw_ref = ray.put(_dsir_lw_table(cnt))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(lw_ref)
        df = df.reset_index(drop=True)
        n_grams = _dsir_grams(df["text"]).str.len().to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_grams": n_grams,
                "dsir_logweight": r2(_dsir_sums(df, table), 6),
            }
        )
        return out[out["n_grams"] > 0]

    return (
        _read_docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(score, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _dsir_ctes(doc_src: str) -> str:
    """The w/bg/g/hb/cnt/tot/lw CTE block over ``doc_src`` (a FROM
    fragment yielding (doc_id, lang, text)) — shared by the standalone
    weights oracle and the selection composite's oracle (the _kmeans_ctes
    pattern)."""
    return f"""w AS (
  SELECT doc_id, lang,
         unnest(string_split(lower(coalesce(text, '')), ' ')) AS word,
         unnest(range(len(string_split(lower(coalesce(text, '')), ' ')))) AS wi
  FROM {doc_src}
),
bg AS (
  SELECT a.doc_id, a.lang, a.word || ' ' || b.word AS gram
  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.wi = a.wi + 1
),
g AS (
  SELECT doc_id, lang, word AS gram FROM w
  UNION ALL SELECT doc_id, lang, gram FROM bg
),
hb AS (
  SELECT doc_id, lang,
         (('0x' || substr(md5(gram), 1, 8))::UBIGINT % {DSIR_BUCKETS})::BIGINT AS b
  FROM g
),
cnt AS (
  SELECT b, COUNT(*)::BIGINT AS c_raw,
         SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)::BIGINT AS c_tgt
  FROM hb GROUP BY b
),
tot AS (SELECT SUM(c_raw)::DOUBLE AS t_raw, SUM(c_tgt)::DOUBLE AS t_tgt FROM cnt),
lw AS (
  SELECT b,
         ln((c_tgt + 1.0) / (t_tgt + {DSIR_BUCKETS}))
         - ln((c_raw + 1.0) / (t_raw + {DSIR_BUCKETS})) AS wgt
  FROM cnt, tot
)"""


DSIR_WEIGHTS_SQL = f"""
WITH {_dsir_ctes("documents")}
SELECT h.doc_id, COUNT(*)::BIGINT AS n_grams,
       ROUND(SUM(l.wgt), 6) AS dsir_logweight
FROM hb h JOIN lw l USING (b)
GROUP BY h.doc_id
"""


# --------------------------------------------------------------------------
# Corpus selection composite: Gopher quality gate → DSIR importance scoring
# → exact top-half selection — the canonical "filter then select what looks
# like the target" pretraining recipe (Rae et al. 2021 rules feeding Xie et
# al. 2023 selection). The selection quota is data-dependent (⌈P/2⌉ of the
# P passing docs), so the cut is an EXACT distributed order statistic over
# the derived weight column, not a driver sort:
#   pass A  stream docs → gopher mask → hashed-gram (bucket → raw, target)
#           count partials restricted to passing docs (+ a sentinel row
#           carrying the passing-doc count) → ONE combinable exchange to a
#           constant-size table; log-ratio table broadcast (4096 floats)
#   pass B  stream passing docs → integer micro-weight w_int (= 1e6 × the
#           6-dp weight, exact) → value-bucketed (vb, w_int) histogram
#           (ONE combinable exchange, bounded by distinct weights per vb);
#           driver prefixes O(#vb) totals, a distributed rank lookup in the
#           ONE bucket holding the quota rank yields the threshold T and
#           count(> T); ties at T resolved by doc_id asc against the quota
#           (tie set is count(= T) rows — logged, ~1 at 6-dp weights)
#   pass C  stream passing docs again, keep w_int > T or the tie winners.
# Docs never cross an exchange; the driver holds only constant-size or
# tie-bounded state. Oracle: the composed SQL (gopher predicate → DSIR
# CTEs → ROW_NUMBER quota cut).

WSEL_SPAN = 1 << 16  # micro-weight units per histogram value-bucket


def _gopher_pass_mask(texts: pd.Series) -> np.ndarray:
    toks = texts.fillna("").str.lower().str.findall(WORD_RE)
    return gopher_rules(*gopher_metrics(toks))


def select_corpus(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Sum

    # ---- pass A: DSIR bucket counts over the passing slice (+ P sentinel)
    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        keep = _gopher_pass_mask(df["text"])
        sent = pd.DataFrame({"b": [-1], "c_raw": [int(keep.sum())], "c_tgt": [0]})
        out = _dsir_partial_counts(df[keep])
        return pd.concat([out, sent], ignore_index=True)

    cnt = (
        _read_docs(sf_dir, columns=["doc_id", "text", "lang"])
        .map_batches(partial_counts, batch_format="pandas")
        .to_pandas()  # ≤ (DSIR_BUCKETS + 1) × n_blocks rows — bounded
        .groupby("b", as_index=False)
        .sum()  # driver fold (see dsir_weights)
    )
    n_pass = int(cnt.loc[cnt["b"] == -1, "c_raw"].iloc[0])
    cnt = cnt[cnt["b"] >= 0]
    if n_pass == 0:  # nothing survives the gate → empty selection
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "dsir_logweight": pd.Series([], dtype="float64")}
        )
    quota = (n_pass + 1) // 2  # ⌈P/2⌉
    lw_ref = ray.put(_dsir_lw_table(cnt))

    # ---- shared scorer: (doc_id, w_int) for passing docs
    def weights(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(lw_ref)
        df = df[_gopher_pass_mask(df["text"])].reset_index(drop=True)
        if not len(df):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "w_int": pd.Series([], dtype="int64")}
            )
        sums = _dsir_sums(df, table)
        w_int = np.floor(sums * 1e6 + 0.5).astype(np.int64)  # == 1e6 × r2(sums, 6)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "w_int": w_int}
        )

    docs = _read_docs(sf_dir, columns=["doc_id", "text"])
    # score ONCE and keep the narrow (doc_id, w_int) table in the object
    # store (16 B/doc, spillable) — the histogram, tie and final passes all
    # reuse it instead of re-reading + re-hashing the corpus
    scored = docs.map_batches(weights, batch_format="pandas").materialize()

    # ---- pass B: exact quota-th largest weight via bucketed histogram
    def hist_part(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("w_int", as_index=False).size().rename(columns={"size": "cnt"})
        )
        # arithmetic floor-div (negative weights): python // floors
        out["vb"] = (out["w_int"] // WSEL_SPAN).astype("int64")
        return out[["vb", "w_int", "cnt"]].astype("int64")

    hist = (
        scored.map_batches(hist_part, batch_format="pandas")
        .groupby(["vb", "w_int"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    totals = (
        hist.groupby("vb").aggregate(Sum("cnt", alias_name="t")).to_pandas()
        .sort_values("vb")
    )
    totals["base"] = totals["t"].cumsum() - totals["t"]  # ascending-rank base
    R = n_pass - quota  # 0-indexed ascending rank of the quota-th LARGEST
    row = totals[(totals["base"] <= R) & (R < totals["base"] + totals["t"])].iloc[0]
    vb_star, base_star = int(row["vb"]), int(row["base"])
    ref = ray.put((vb_star, base_star, R))

    def lookup(grp: pd.DataFrame) -> pd.DataFrame:
        vb_s, base_s, rank = ray.get(ref)
        if int(grp["vb"].iloc[0]) != vb_s:
            return pd.DataFrame({"T": pd.Series([], dtype="int64"),
                                 "le": pd.Series([], dtype="int64")})
        grp = grp.sort_values("w_int")
        cum = grp["cnt"].cumsum().to_numpy()
        i = int(np.searchsorted(cum, rank - base_s, side="right"))
        return pd.DataFrame(
            {"T": [int(grp["w_int"].to_numpy()[i])],
             "le": [base_s + int(cum[i])]}  # count of values <= T overall
        )

    tl = hist.groupby("vb").map_groups(lookup, batch_format="pandas").to_pandas()
    T, cnt_le = int(tl["T"].iloc[0]), int(tl["le"].iloc[0])
    cnt_gt = n_pass - cnt_le
    tied_keep = quota - cnt_gt

    # tie winners: lowest doc_ids among w_int == T (tie set logged, tiny)
    tied = (
        scored.map_batches(
            lambda df, t=T: df[df["w_int"] == t][["doc_id"]], batch_format="pandas"
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    keep_ids = set(tied["doc_id"].head(tied_keep).astype("int64").tolist())
    keep_ref = ray.put((T, keep_ids))

    # ---- pass C: final selection
    def final(df: pd.DataFrame) -> pd.DataFrame:
        t, ids = ray.get(keep_ref)
        df = df[(df["w_int"] > t) | df["doc_id"].isin(ids)].copy()
        df["dsir_logweight"] = df["w_int"].to_numpy(np.float64) / 1e6
        return df[["doc_id", "dsir_logweight"]]

    return (
        scored.map_batches(final, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _select_corpus_sql() -> str:
    gate = (
        f"(n_words BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS}) "
        f"AND mwl >= {G_MIN_MWL} AND mwl <= {G_MAX_MWL} "
        f"AND dr >= {G_MIN_DISTINCT_RATIO}"
    )
    return rf"""
WITH t0 AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
  FROM documents
), m AS (
  SELECT doc_id, len(toks)::BIGINT AS n_words,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                   / len(toks) END AS mwl,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE len(list_distinct(toks))::DOUBLE / len(toks) END AS dr
  FROM t0
), pass AS (
  SELECT doc_id FROM m WHERE {gate}
), {_dsir_ctes(
    "(SELECT d.doc_id, d.lang, d.text FROM documents d JOIN pass USING (doc_id))"
)}, sc AS (
  SELECT h.doc_id, ROUND(SUM(l.wgt), 6) AS dsir_logweight
  FROM hb h JOIN lw l USING (b)
  GROUP BY h.doc_id
), q AS (SELECT COUNT(*) AS p FROM sc),
sel AS (
  SELECT doc_id, dsir_logweight,
         ROW_NUMBER() OVER (ORDER BY dsir_logweight DESC, doc_id) AS rk
  FROM sc
)
SELECT doc_id, dsir_logweight FROM sel
WHERE rk <= (SELECT (p + 1) // 2 FROM q)
"""


SELECT_CORPUS_SQL = _select_corpus_sql()


# --------------------------------------------------------------------------
# N-gram novelty — the diminishing-returns statistic of data-curation
# studies (what fraction of each document's 3-grams is globally NEW, i.e.
# first occurs in this document under the corpus's (doc_id, position)
# order). The global keep-first resolution is the chunk-dedup shape: only
# NARROW (60-bit md5, packed position) rows pay the one hash-bucketed
# exchange; novel/total partials then fold over a combinable
# groupby(doc_id). Ray resolves on the md5-60bit prefix, the oracle on the
# gram string — identical absent prefix collisions (none at tested sf).

NOVELTY_N = 3
NOVELTY_MAXG = 4096  # packed = doc_id * MAXG + gram_idx
NOVELTY_HBUCKETS = 64


def ngram_novelty(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Sum

    from ..pipelines.analytics import r2

    def explode(df: pd.DataFrame):
        rows_h, rows_packed, tot_doc, tot_n = [], [], [], []
        for d, t in zip(df["doc_id"].astype("int64"), df["text"].fillna("")):
            ws = t.lower().split(" ")
            n = len(ws) - NOVELTY_N + 1
            if n <= 0:
                continue
            # fail fast: gi >= MAXG would alias into doc d+1's packed range
            # (a real exception, not assert: -O must not strip this guard)
            if n > NOVELTY_MAXG:
                raise ValueError(
                    f"doc {d}: {n} grams exceeds NOVELTY_MAXG — raise the packing width"
                )
            for gi in range(n):
                gram = " ".join(ws[gi : gi + NOVELTY_N])
                rows_h.append(
                    int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16)
                )
                rows_packed.append(int(d) * NOVELTY_MAXG + gi)
            tot_doc.append(int(d))
            tot_n.append(n)
        return (
            pd.DataFrame(
                {"h": np.asarray(rows_h, np.int64),
                 "packed": np.asarray(rows_packed, np.int64)}
            ),
            pd.DataFrame(
                {"doc_id": np.asarray(tot_doc, np.int64),
                 "n_grams": np.asarray(tot_n, np.int64),
                 "n_novel": np.zeros(len(tot_doc), np.int64)}
            ),
        )

    def hash_rows(df: pd.DataFrame) -> pd.DataFrame:
        hp, _ = explode(df)
        hp["hb"] = (hp["h"] % NOVELTY_HBUCKETS).astype("int64")
        return hp

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        win = g.groupby("h")["packed"].min()
        docs = (win.to_numpy(np.int64) // NOVELTY_MAXG)
        out = (
            pd.DataFrame({"doc_id": docs})
            .groupby("doc_id", as_index=False)
            .size()
            .rename(columns={"size": "n_novel"})
        )
        out["n_grams"] = np.int64(0)
        return out[["doc_id", "n_grams", "n_novel"]].astype("int64")

    docs = _read_docs(sf_dir)
    novel = (
        docs.map_batches(hash_rows, batch_format="pandas")
        .groupby("hb")
        .map_groups(winners, batch_format="pandas")
    )
    def total_rows(df: pd.DataFrame) -> pd.DataFrame:
        # count-only: no hashing (explode() would md5 every gram twice)
        n = (
            df["text"].fillna("").str.lower().str.split(" ").str.len()
            - NOVELTY_N + 1
        ).clip(lower=0).astype("int64")
        out = pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "n_grams": n,
             "n_novel": np.zeros(len(df), np.int64)}
        )
        return out[out["n_grams"] > 0]

    totals = docs.map_batches(total_rows, batch_format="pandas")
    per = (
        novel.union(totals)
        .groupby("doc_id")
        .aggregate(
            Sum("n_grams", alias_name="n_grams"),
            Sum("n_novel", alias_name="n_novel"),
        )
        .to_pandas()
    )
    per["novelty"] = r2(
        per["n_novel"].to_numpy(np.float64) / per["n_grams"].to_numpy(np.float64), 6
    )
    return (
        per.astype({"doc_id": "int64", "n_grams": "int64", "n_novel": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


NGRAM_NOVELTY_SQL = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word,
         unnest(range(len(string_split(lower(text), ' ')))) AS wi
  FROM documents
),
g AS (
  SELECT a.doc_id, a.wi AS gi,
         a.word || ' ' || b.word || ' ' || c.word AS gram
  FROM w a
  JOIN w b ON b.doc_id = a.doc_id AND b.wi = a.wi + 1
  JOIN w c ON c.doc_id = a.doc_id AND c.wi = a.wi + 2
),
own AS (
  SELECT gram, MIN(doc_id * {NOVELTY_MAXG} + gi) AS keep FROM g GROUP BY gram
),
per AS (
  SELECT g.doc_id, COUNT(*)::BIGINT AS n_grams,
         SUM(CASE WHEN g.doc_id * {NOVELTY_MAXG} + g.gi = o.keep
             THEN 1 ELSE 0 END)::BIGINT AS n_novel
  FROM g JOIN own o USING (gram)
  GROUP BY g.doc_id
)
SELECT doc_id, n_grams, n_novel,
       ROUND(n_novel / n_grams::DOUBLE, 6) AS novelty
FROM per
"""


# ---------------------------------------------------------------- zipf_slope
# Zipf-law audit: OLS slope of ln(tf) on ln(rank) over the top-N vocabulary
# — the standard corpus-health diagnostic (natural text reads ≈ -1; a
# boilerplate-flooded or template-generated corpus drifts flat). Term
# counts come from the distributed combiner pass (_corpus_term_stats); the
# regression runs on the driver over the vocab-bounded top-N.
#
# Float discipline: the four OLS sums are LEFT FOLDS IN RANK ORDER on both
# sides — Python accumulates in rank order; the oracle uses running window
# sums (ORDER BY rank ROWS UNBOUNDED PRECEDING), which DuckDB evaluates as
# the same sequential fold — so slope/intercept are bit-identical before
# the mirrored 6-dp round.
ZIPF_TOPN = 1000


def zipf_slope(sf_dir: str) -> pd.DataFrame:
    import math

    top = (
        _corpus_term_stats(sf_dir)
        .sort(["tf", "term"], descending=[True, False])
        .limit(ZIPF_TOPN)
        .to_pandas()
    )
    n = len(top)
    sx = sy = sxy = sxx = 0.0
    for rank, tf in enumerate(top["tf"].astype(int), start=1):
        x, y = math.log(float(rank)), math.log(float(tf))
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame(
        {
            "n_terms": np.array([n], dtype=np.int64),
            "slope": np.array([round(slope, 6)], dtype=np.float64),
            "intercept": np.array([round(intercept, 6)], dtype=np.float64),
        }
    )


ZIPF_SLOPE_SQL = rf"""
WITH tf AS (
  SELECT term, COUNT(*)::BIGINT AS tf
  FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS term
        FROM documents)
  GROUP BY term
),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS rank, tf
  FROM tf ORDER BY tf DESC, term LIMIT {ZIPF_TOPN}
),
xy AS (
  SELECT rank, LN(rank::DOUBLE) AS x, LN(tf::DOUBLE) AS y FROM ranked
),
folds AS (
  SELECT rank,
         SUM(x)     OVER w AS sx,  SUM(y)   OVER w AS sy,
         SUM(x * y) OVER w AS sxy, SUM(x * x) OVER w AS sxx,
         COUNT(*)   OVER w AS k
  FROM xy
  WINDOW w AS (ORDER BY rank ROWS UNBOUNDED PRECEDING)
),
fin AS (SELECT * FROM folds ORDER BY rank DESC LIMIT 1)
SELECT k::BIGINT AS n_terms,
       ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS slope,
       ROUND((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx) / k, 6)
         AS intercept
FROM fin
"""
