"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

These extend the reference's per-record string-processing family
(SURVEY.md §2.10 — regex extraction, normalization, validation in
funda_spider.py / pipelines.py) to the corpus level. Every stage is a
vectorized-or-C-speed ``map_batches`` over the ``documents`` table; no
Python loop does per-character work (regex/hashlib are C).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import ray.data

WORD_RE = re.compile(r"\S+")
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")
PUNCT_RE = re.compile(r"[^\w\s]")

# tiny high-frequency stopword sets; deterministic tie order en < nl < de < fr
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "nl": ["de", "het", "een", "en", "van", "ik", "dat", "die", "niet", "met"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "et", "des", "est", "pas", "une", "dans", "que"],
}
LANG_ORDER = ["en", "nl", "de", "fr"]


def _read_docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
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
def lang_id(sf_dir: str) -> pd.DataFrame:
    """n-gram/stopword language heuristic: count stopword hits per language,
    argmax with deterministic tie order (en, nl, de, fr); 'und' when no
    stopword hits at all."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        txt = df["text"].fillna("").str.lower()
        toks = txt.str.findall(WORD_RE)
        scores = {
            lang: toks.map(lambda ts, s=set(ws): sum(t in s for t in ts))
            for lang, ws in STOPWORDS.items()
        }
        import numpy as np

        mat = np.stack([scores[lang].to_numpy() for lang in LANG_ORDER])
        best = mat.argmax(axis=0)  # first max wins → deterministic tie order
        pred = np.where(mat.max(axis=0) > 0, np.array(LANG_ORDER)[best], "und")
        return pd.DataFrame({"doc_id": df["doc_id"], "pred_lang": pred})

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


def winnow_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Rolling-hash document fingerprint via winnowing (the k-gram /
    window-min scheme of the public winnowing literature): hash every
    char ``k``-gram, slide a ``w``-window over the hash sequence keeping
    each window's minimum, and fingerprint the document as the distinct
    min-set. Overlapping documents share winnowed hashes, so the digest
    supports containment/near-dup detection where the whole-text md5
    (``fingerprints``) only catches exact matches. Deterministic: gram
    hash = first 8 hex chars of md5 (DuckDB-recomputable)."""
    import numpy as np

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": df["doc_id"], "n_grams": [], "n_winnow": [], "winnow_digest": []}
        for text in df["text"].fillna(""):
            n = len(text)
            grams = [text[i : i + WINNOW_K] for i in range(max(n - WINNOW_K + 1, 0))]
            hs = np.array(
                [int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) for g in grams],
                dtype=np.int64,
            )
            out["n_grams"].append(len(hs))
            if len(hs) == 0:
                out["n_winnow"].append(0)
                out["winnow_digest"].append(hashlib.md5(b"").hexdigest())
                continue
            if len(hs) <= WINNOW_W:
                wins = {int(hs.min())}
            else:
                sw = np.lib.stride_tricks.sliding_window_view(hs, WINNOW_W)
                wins = set(sw.min(axis=1).tolist())
            out["n_winnow"].append(len(wins))
            joined = ",".join(str(v) for v in sorted(wins))
            out["winnow_digest"].append(hashlib.md5(joined.encode()).hexdigest())
        return pd.DataFrame(out).astype({"n_grams": "int64", "n_winnow": "int64"})

    return (
        _read_docs(sf_dir)
        .map_batches(f, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


WINNOW_FINGERPRINTS_SQL = f"""
WITH g AS (
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
)
SELECT doc_id, n::BIGINT AS n_grams, len(wins)::BIGINT AS n_winnow,
       md5(array_to_string(list_sort(wins), ',')) AS winnow_digest
FROM w
"""
