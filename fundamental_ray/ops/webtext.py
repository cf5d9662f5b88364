"""Round-4 web-text utilities: deterministic corpus splits, PII scrubbing,
per-entity robust anomaly flags, and compressibility-based quality ranking.

These extend the training-data operator suite (SURVEY.md §2.10 / the LLM
ops inventory) with the remaining plumbing a pre-training data pipeline
runs between dedup and tokenization: hash-deterministic train/valid/test
assignment (stable across runs, machines and partitionings — the split a
100-TB pipeline must be able to recompute from scratch bit-identically),
regex PII redaction (emails / IPv4), per-user median-absolute-deviation
outlier flags over the event stream, and a zlib-compressibility signal
(the Gopher/C4 family's "too repetitive to train on" heuristic).

Scale shape: every operator is a vectorized ``map_batches`` with no
driver-side state; the split op pre-aggregates inside each batch (classic
combiner) so the global groupby shuffles at most |splits|x|langs| rows per
block, and the MAD op pays exactly one hash exchange on user_id.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Sum

from fundamental_ray.sources.parquet import read_parquet_clean

# --------------------------------------------------------------------------
# Deterministic train/valid/test split --------------------------------------
SPLIT_MOD = 100
SPLIT_TRAIN_LT = 90  # md5 bucket < 90  -> train
SPLIT_VALID_LT = 95  # 90 <= bucket < 95 -> valid, else test


def _split_of(doc_ids) -> list[str]:
    out = []
    for d in doc_ids:
        b = int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16) % SPLIT_MOD
        out.append("train" if b < SPLIT_TRAIN_LT else "valid" if b < SPLIT_VALID_LT else "test")
    return out


def split_train_holdout(sf_dir: str) -> pd.DataFrame:
    """Hash-deterministic 90/5/5 split with per-(split, lang) document and
    character tallies. The assignment is a pure function of doc_id (md5
    bucket), so any worker — or a rerun years later — reproduces the same
    membership without coordination or RNG state. Each batch reduces to at
    most |splits|x|langs| partial rows before the (tiny) global groupby:
    the shuffle volume is independent of corpus size."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(split=_split_of(df["doc_id"]))
        g = df.groupby(["split", "lang"], as_index=False).agg(
            n_docs=("doc_id", "size"), total_chars=("n_chars", "sum")
        )
        return g.astype({"n_docs": "int64", "total_chars": "int64"})

    out = (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        )
        .map_batches(partial, batch_format="pandas")
        .groupby(["split", "lang"])
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("total_chars", alias_name="total_chars"))
        .to_pandas()
        .sort_values(["split", "lang"])
        .reset_index(drop=True)
    )
    return out.astype({"n_docs": "int64", "total_chars": "int64"})


SPLIT_TRAIN_HOLDOUT_SQL = f"""
SELECT CASE WHEN b < {SPLIT_TRAIN_LT} THEN 'train'
            WHEN b < {SPLIT_VALID_LT} THEN 'valid' ELSE 'test' END AS split,
       lang, COUNT(*)::BIGINT AS n_docs, SUM(n_chars)::BIGINT AS total_chars
FROM (
  SELECT lang, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % {SPLIT_MOD} AS b
  FROM documents
)
GROUP BY 1, 2
ORDER BY split, lang
"""


# --------------------------------------------------------------------------
# PII scrub -----------------------------------------------------------------
# Patterns restricted to syntax with identical semantics in Python re and
# DuckDB's RE2 (no backrefs, no lookaround; both default-greedy).
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PAT = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
EMAIL_RE = re.compile(EMAIL_PAT)
IPV4_RE = re.compile(IPV4_PAT)


def pii_scrub(sf_dir: str) -> pd.DataFrame:
    """Redact emails / IPv4 literals and fingerprint the scrubbed text.

    Returns (doc_id, n_emails, n_ips, scrubbed_md5) for every document, so
    the oracle verifies both the hit counts AND that the replacement is
    byte-exact (md5 of the redacted text). The synthetic corpus contains
    no PII — the hit path is exercised against DuckDB on crafted strings
    in tests/test_webtext.py. Embarrassingly parallel; regexes are
    module-level compiled (C speed via pandas .str)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        txt = df["text"].fillna("")
        red = txt.str.replace(EMAIL_RE, "<EMAIL>", regex=True).str.replace(
            IPV4_RE, "<IP>", regex=True
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_emails": txt.str.count(EMAIL_PAT).astype("int64"),
                "n_ips": txt.str.count(IPV4_PAT).astype("int64"),
                "scrubbed_md5": [
                    hashlib.md5(t.encode()).hexdigest() for t in red
                ],
            }
        )

    return (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(f, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


PII_SCRUB_SQL = rf"""
SELECT doc_id,
       len(regexp_extract_all(coalesce(text, ''), '{EMAIL_PAT}'))::BIGINT AS n_emails,
       len(regexp_extract_all(coalesce(text, ''), '{IPV4_PAT}'))::BIGINT AS n_ips,
       md5(regexp_replace(
             regexp_replace(coalesce(text, ''), '{EMAIL_PAT}', '<EMAIL>', 'g'),
             '{IPV4_PAT}', '<IP>', 'g')) AS scrubbed_md5
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Per-user MAD anomaly flags ------------------------------------------------
MAD_K = 3.0  # flag |value - median| > K * MAD


def events_anomaly_mad(sf_dir: str) -> pd.DataFrame:
    """Median-absolute-deviation outlier detection per user over the event
    stream — the robust-statistics cousin of the z-score op (pipelines/
    relational.py events_zscore): one hash exchange on user_id, then each
    group computes its median, MAD and flags locally in ``map_groups``.
    Returns only the flagged events. Deviations are reported at 6 dp; both
    sides compute the identical double-precision |v - median| so the
    rounding mirrors (ADVICE r3 discipline: no 2-dp boundaries on
    float-merged values)."""

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(dtype=np.float64)
        med = float(np.median(v))
        dev = np.abs(v - med)
        mad = float(np.median(dev))
        keep = dev > MAD_K * mad
        if not keep.any():
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "event_id": pd.Series([], dtype="int64"),
                 "deviation": pd.Series([], dtype="float64")}
            )
        out = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy()[keep],
                "event_id": g["event_id"].to_numpy()[keep],
                "deviation": np.round(dev[keep], 6),
            }
        )
        return out.astype({"user_id": "int64", "event_id": "int64"})

    return (
        read_parquet_clean(
            f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
        )
        .groupby("user_id")
        .map_groups(flag, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )


EVENTS_ANOMALY_MAD_SQL = f"""
WITH med AS (
  SELECT user_id, MEDIAN(value) AS med FROM events GROUP BY user_id
), dev AS (
  SELECT e.user_id, e.event_id, ABS(e.value - m.med) AS dev,
         m.med
  FROM events e JOIN med m USING (user_id)
), mad AS (
  SELECT user_id, MEDIAN(dev) AS mad FROM dev GROUP BY user_id
)
SELECT d.user_id, d.event_id, ROUND(d.dev, 6) AS deviation
FROM dev d JOIN mad m USING (user_id)
WHERE d.dev > {MAD_K} * m.mad
ORDER BY d.user_id, d.event_id
"""


# --------------------------------------------------------------------------
# Compressibility quality signal (no SQL oracle: zlib is not expressible
# in DuckDB — registered rows-only, invariants pinned in tests) ------------
COMP_LEVEL = 6
COMP_TOPK = 25


def compression_ratio_topk(sf_dir: str, k: int = COMP_TOPK) -> pd.DataFrame:
    """Most-compressible documents: zlib(level 6) compressed size over raw
    size, in basis points (integer — no float-boundary surface). Extreme
    compressibility means boilerplate/repetition (the C4/Gopher cut);
    zlib is deterministic for a fixed level, so the ranking is stable.
    Per-batch top-k partials, then one tiny driver fold — the corpus text
    never leaves the batch it arrived in."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        txt = df["text"].fillna("")
        ratios = []
        for t in txt:
            raw = t.encode()
            ratios.append(
                10_000 * len(zlib.compress(raw, COMP_LEVEL)) // len(raw)
                if raw else 10_000
            )
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_chars": txt.str.len().astype("int64"),
                "ratio_bp": pd.Series(ratios, index=df.index, dtype="int64"),
            }
        )
        return out.nsmallest(k, ["ratio_bp", "doc_id"])

    parts = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()  # <= k rows per block — constant-size driver fold
    )
    return (
        parts.nsmallest(k, ["ratio_bp", "doc_id"])
        .sort_values(["ratio_bp", "doc_id"])
        .reset_index(drop=True)
    )
