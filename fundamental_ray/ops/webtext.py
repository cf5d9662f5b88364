"""Round-4 web-text utilities: deterministic corpus splits, PII scrubbing,
per-entity robust anomaly flags, compressibility-based quality ranking,
PMI collocation mining, and watermark/late-event accounting.

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

# --------------------------------------------------------------------------
# PMI collocation mining ----------------------------------------------------
# Pointwise mutual information over adjacent token pairs — the classic
# collocation / multi-word-expression detector a corpus-curation pipeline
# runs to build phrase vocabularies (Church & Hanks 1990; word2vec's
# phrase pass uses the same count ratio). Tokenization mirrors the vocab /
# pack ops (lowercase, \S+ runs), so all token-level ops share one contract.
#
# Scale shape: bigram counts are per-batch combiner dicts (documents never
# straddle batches, so adjacency is batch-local by construction) merged by
# ONE groupby-sum exchange over bigram-vocab-sized partials; the corpus
# token stream never crosses an exchange. Unigram totals reuse
# corpus_stats._corpus_term_stats (same combiner idiom) and are collected
# once — vocab-bounded by Heaps' law (the bpe.py scaling argument). The
# PMI score pass is a map_batches over the AGGREGATED bigram table with
# the unigram dict broadcast via ray.put — never re-shipped per batch.
PMI_MIN_COUNT = 5
PMI_TOPK = 30


def _bigram_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch adjacent-pair combiner (docs never straddle batches, so
    adjacency is batch-local) — shared by PMI and the bigram-LM scorer.

    Vectorized (ops/text.flat_tokens): adjacent pairs are a shifted-mask
    over the flat token stream (same-doc positions only), counted by one
    np.unique over packed (code_a, code_b) int64 keys — no Python pair
    loop (VERDICT r4 "What's wrong" #3)."""
    from .text import flat_tokens

    import pyarrow as pa

    toks, doc = flat_tokens(df["text"])
    if len(toks) < 2:
        return pa.table(
            {"k": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
        )
    codes, uniq = pd.factorize(toks)
    v = np.int64(len(uniq))
    same = doc[1:] == doc[:-1]
    key = codes[:-1][same].astype(np.int64) * v + codes[1:][same]
    ukey, cnt = np.unique(key, return_counts=True)
    # ONE packed string key ("w1 w2" — a space can never appear inside a
    # \S+ token, so the join is unambiguous) instead of a two-string-key
    # exchange: Ray 2.49's multi-key pandas aggregate costs seconds at
    # this group count where the single-key path costs one
    a = (ukey // v).astype(np.int64)
    b = (ukey % v).astype(np.int64)
    # Arrow out (see _partial_term_counts)
    return pa.table(
        {
            "k": pa.array([f"{uniq[i]} {uniq[j]}" for i, j in zip(a, b)],
                          pa.string()),
            "c": pa.array(cnt.astype(np.int64)),
        }
    )


# (abspath, fingerprint) -> (w1, w2, cnt) pandas result — shared by PMI
# and the bigram-LM scorer; bigram-vocab-bounded (Heaps), so holding it
# driver-side is the same broadcast-small-side trade as the unigram memo
# (corpus_stats._corpus_term_stats_df).
_BIGRAM_MEMO: dict = {}


def _bigram_counts_df(sf_dir: str) -> pd.DataFrame:
    import os as _os

    from fundamental_ray.state.diskcache import source_fingerprint

    key = (
        _os.path.abspath(sf_dir),
        source_fingerprint(f"{sf_dir}/documents.parquet"),
    )
    if key not in _BIGRAM_MEMO:
        agg = (
            read_parquet_clean(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            )
            .map_batches(_bigram_partials, batch_format="pandas")
            .groupby("k")
            .aggregate(Sum("c", alias_name="cnt"))
            .to_pandas()
        )
        split = agg["k"].str.split(" ", n=1, expand=True)
        _BIGRAM_MEMO[key] = (
            pd.DataFrame(
                {"w1": split[0], "w2": split[1],
                 "cnt": agg["cnt"].astype("int64")}
            )
            .sort_values(["w1", "w2"])
            .reset_index(drop=True)
        )
    return _BIGRAM_MEMO[key]


def _bigram_counts(sf_dir: str) -> ray.data.Dataset:
    """Distributed (w1, w2, cnt) over the corpus — ONE groupby-sum exchange
    over bigram-vocab-sized partials (memoized; see _bigram_counts_df)."""
    return ray.data.from_pandas(_bigram_counts_df(sf_dir))


def pmi_bigrams(sf_dir: str, k: int = PMI_TOPK) -> pd.DataFrame:
    """Top-k adjacent-pair collocations by PMI (ties: w1, w2 asc).

    PMI is computed with the EXACT association both sides mirror:
    ln( (c_bi/N_bi) / ((c1/N_uni) * (c2/N_uni)) ), rounded at 6 dp —
    IEEE-identical on identical integer inputs, so the hash compares clean
    (the r3 float-boundary discipline)."""
    import math

    import ray

    from .corpus_stats import _corpus_term_stats

    bg = (
        _bigram_counts(sf_dir)
        .materialize()  # bigram-vocab-sized; reused for total + score pass
    )
    n_bi = int(bg.sum(on="cnt"))

    uni = _corpus_term_stats(sf_dir).to_pandas()  # vocab-bounded (Heaps)
    n_uni = int(uni["tf"].sum())
    uni_ref = ray.put(dict(zip(uni["term"], uni["tf"].astype(int))))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        tf = ray.get(uni_ref)
        df = df[df["cnt"] >= PMI_MIN_COUNT]
        if df.empty:
            return pd.DataFrame(
                {"w1": pd.Series([], dtype=object), "w2": pd.Series([], dtype=object),
                 "cnt": pd.Series([], dtype="int64"),
                 "pmi": pd.Series([], dtype="float64")}
            )
        pmi = [
            round(
                math.log(
                    (c / n_bi) / ((tf[a] / n_uni) * (tf[b] / n_uni))
                ),
                6,
            )
            for a, b, c in zip(df["w1"], df["w2"], df["cnt"])
        ]
        return pd.DataFrame(
            {
                "w1": df["w1"].to_numpy(),
                "w2": df["w2"].to_numpy(),
                "cnt": df["cnt"].astype("int64").to_numpy(),
                "pmi": np.array(pmi, dtype=np.float64),
            }
        )

    out = (
        bg.map_batches(score, batch_format="pandas")
        .sort(["pmi", "w1", "w2"], descending=[True, False, False])
        .limit(k)
        .to_pandas()
    )
    return out.astype({"cnt": "int64"})


PMI_BIGRAMS_SQL = rf"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS l FROM documents
), bi AS (
  SELECT l[i] AS w1, l[i + 1] AS w2, COUNT(*)::BIGINT AS cnt
  FROM d, UNNEST(range(1, len(l))) AS r(i)
  GROUP BY 1, 2
), uni AS (
  SELECT unnest(l) AS term FROM d
), tf AS (
  SELECT term, COUNT(*)::BIGINT AS c FROM uni GROUP BY term
), tot AS (
  SELECT (SELECT SUM(cnt) FROM bi) AS n_bi, (SELECT SUM(c) FROM tf) AS n_uni
)
SELECT b.w1, b.w2, b.cnt,
       ROUND(LN( (b.cnt::DOUBLE / t.n_bi)
                 / ((t1.c::DOUBLE / t.n_uni) * (t2.c::DOUBLE / t.n_uni)) ), 6) AS pmi
FROM bi b, tot t
JOIN tf t1 ON t1.term = b.w1
JOIN tf t2 ON t2.term = b.w2
WHERE b.cnt >= {PMI_MIN_COUNT}
ORDER BY pmi DESC, w1, w2 LIMIT {PMI_TOPK}
"""


# --------------------------------------------------------------------------
# Watermark / late-event accounting ------------------------------------------
# The Flink/Beam out-of-order-stream model: events ARRIVE later than they
# OCCURRED. The synthetic events table is ts-monotone in event_id, so the
# arrival process is derived deterministically — arrival = ts + jitter,
# jitter = md5(event_id) % JITTER_MOD_S seconds (the split op's
# DuckDB-recomputable hash idiom). The watermark is the canonical
# "max event-time seen so far, minus the allowed lateness": an event whose
# own ts is below the watermark at its arrival is LATE (would be dropped /
# side-channelled by a streaming engine).
#
# Scale shape: NO global sort. Arrival order comes from the bucket
# decomposition of arrival time (pack.py's two-pass prefix-scan idiom):
# per-bucket max-ts partials cross one tiny groupby, the driver folds the
# O(buckets) table into exclusive prefix maxima (bucket order = arrival
# order because bucket = arrival_us // span) and broadcasts the dict once;
# each bucket then folds locally (sort-within-bucket + running max). The
# event stream pays exactly ONE hash exchange (the bucket groupby).
WM_JITTER_MOD_S = 3600  # arrival delay: md5(event_id) % 1h
WM_LATENESS_S = 300  # allowed lateness: 5 min
WM_BUCKET_SPAN_US = 6 * 3600 * 1_000_000  # 6h arrival buckets


def _arrival_jitter_s(event_ids) -> np.ndarray:
    return np.array(
        [
            int(hashlib.md5(str(int(e)).encode()).hexdigest()[:8], 16)
            % WM_JITTER_MOD_S
            for e in event_ids
        ],
        dtype=np.int64,
    )


def events_watermark_late(sf_dir: str) -> pd.DataFrame:
    """Late events under a max-event-time-minus-lateness watermark.

    Returns (event_id, ts_us, arrival_us, wm_us) for every late event —
    wm_us is the watermark in force at the event's arrival (max prior ts
    in arrival order minus the lateness allowance); all columns integer
    epoch-microseconds so the oracle hash has no timestamp-representation
    surface. Arrival ties break by event_id on both sides."""
    import ray
    from ray.data.aggregate import Max

    def project(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].astype("datetime64[us]").astype("int64")
        arr_us = ts_us + 1_000_000 * _arrival_jitter_s(df["event_id"])
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "ts_us": ts_us,
                "arrival_us": arr_us,
                "bucket": arr_us // WM_BUCKET_SPAN_US,
            }
        )

    proj = (
        read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
        .map_batches(project, batch_format="pandas")
        .materialize()  # narrow 32-byte rows; read once, used twice
    )

    parts = (
        proj.groupby("bucket")
        .aggregate(Max("ts_us", alias_name="mx"))
        .to_pandas()
        .sort_values("bucket")
    )
    # exclusive prefix max over buckets (bucket order == arrival order)
    prefix = parts["mx"].cummax().shift(1)
    base_ref = ray.put(
        {
            int(b): (None if pd.isna(p) else int(p))
            for b, p in zip(parts["bucket"], prefix)
        }
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(base_ref)[int(g["bucket"].iloc[0])]
        g = g.sort_values(["arrival_us", "event_id"], kind="mergesort")
        ts = g["ts_us"].to_numpy()
        # running max of PRIOR ts within the bucket, seeded by the
        # exclusive cross-bucket prefix max (ts_us < 2^53: float64-exact)
        seed = -np.inf if base is None else float(base)
        cm = np.maximum.accumulate(ts).astype(np.float64)
        prior = np.full(len(ts), seed)
        np.maximum(prior[1:], cm[:-1], out=prior[1:])
        wm = prior - WM_LATENESS_S * 1_000_000
        keep = ts < wm
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[keep],
                "ts_us": ts[keep],
                "arrival_us": g["arrival_us"].to_numpy()[keep],
                "wm_us": wm[keep].astype(np.int64),
            }
        )

    return (
        proj.groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .sort_values(["arrival_us", "event_id"])
        .reset_index(drop=True)
        .astype({"event_id": "int64", "ts_us": "int64",
                 "arrival_us": "int64", "wm_us": "int64"})
    )


EVENTS_WATERMARK_LATE_SQL = f"""
WITH a AS (
  SELECT event_id, epoch_us(ts)::BIGINT AS ts_us,
         epoch_us(ts)::BIGINT + 1000000 * (
           ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::UBIGINT
           % {WM_JITTER_MOD_S})::BIGINT AS arrival_us
  FROM events
), w AS (
  SELECT *, MAX(ts_us) OVER (
           ORDER BY arrival_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prior
  FROM a
)
SELECT event_id, ts_us, arrival_us,
       (max_prior - {WM_LATENESS_S} * 1000000)::BIGINT AS wm_us
FROM w WHERE ts_us < max_prior - {WM_LATENESS_S} * 1000000
ORDER BY arrival_us, event_id
"""


# --------------------------------------------------------------------------
# Stratified deterministic sampling -----------------------------------------
# Exact n-per-stratum sampling by md5 rank — the "pull a fixed-size audit /
# eval sample per language" primitive. The sample is a pure function of
# doc_id (rank by md5 hex within stratum), so it is reproducible across
# runs, machines and partitionings, and REFERENCEABLE: the same doc ids
# come back after any upstream re-shard.
#
# Scale shape: classic distributed per-group top-k — each batch keeps at
# most n rows per stratum it sees (combiner), so the exchange carries
# ≤ n × strata × blocks narrow rows; the final per-stratum cut happens in
# map_groups. Text never moves; only (lang, doc_id, key).
STRAT_N = 50  # sample size per stratum


def stratified_sample(sf_dir: str, n: int = STRAT_N) -> pd.DataFrame:
    """(lang, doc_id, rn): the n lowest-md5-rank docs per lang, rn = the
    1-based rank. md5 hex compares lexicographically identically in Python
    and DuckDB (both lowercase hex), so membership AND rank mirror."""

    def key_of(ids) -> list[str]:
        return [hashlib.md5(str(int(d)).encode()).hexdigest() for d in ids]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "lang": df["lang"],
                "doc_id": df["doc_id"].astype("int64"),
                "k": key_of(df["doc_id"]),
            }
        )
        return (
            out.sort_values(["k", "doc_id"])
            .groupby("lang", sort=False)
            .head(n)
        )

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["k", "doc_id"]).head(n)
        return pd.DataFrame(
            {
                "lang": g["lang"].to_numpy(),
                "doc_id": g["doc_id"].to_numpy(),
                "rn": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
        .map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(cut, batch_format="pandas")
        .to_pandas()
        .sort_values(["lang", "rn"])
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "rn": "int64"})
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT lang, doc_id, rn FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         )::BIGINT AS rn
  FROM documents
) WHERE rn <= {STRAT_N}
ORDER BY lang, rn
"""


# --------------------------------------------------------------------------
# Bigram-LM perplexity scoring (CCNet-style quality filtering) ---------------
# CCNet (Wenzek et al. 2020) ranks documents by the perplexity of a language
# model trained on a trusted corpus; here the LM is an add-one-smoothed
# bigram model trained on the corpus itself (the self-perplexity variant —
# high-ppl docs are the statistical outliers a curation pass inspects).
#
# Scale shape: training is the PMI machinery (unigram + bigram count
# combiners, one exchange each); the count tables are broadcast ONCE via
# ray.put and the scoring pass streams the corpus. A production LM is
# pruned/hashed to a fixed vocabulary precisely so this broadcast stays
# constant-size at 100 TB (the DSIR 4096-bucket argument; CCNet itself
# ships a fixed SentencePiece+KenLM model to every worker).
def bigram_perplexity(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_tok, ppl) for every non-empty doc under the add-one
    bigram LM: P(w1) = (c(w1)+1)/(N+V); P(w|v) = (c(v,w)+1)/(c(v)+V);
    ppl = exp(-logP/n_tok) rounded at 6 dp. Association mirrors the oracle
    term-for-term; the 6-dp boundary has ~1e-11 headroom (log-sum drift)."""
    import math

    import ray

    from .corpus_stats import _corpus_term_stats
    from .text import WORD_RE

    uni = _corpus_term_stats(sf_dir).to_pandas()  # vocab-bounded (Heaps)
    n_uni = int(uni["tf"].sum())
    v = len(uni)
    bi = _bigram_counts(sf_dir).to_pandas()  # pruned-LM-bounded (see above)
    uni_ref = ray.put(dict(zip(uni["term"], uni["tf"].astype(int))))
    bi_ref = ray.put(
        {(a, b): int(c) for a, b, c in zip(bi["w1"], bi["w2"], bi["cnt"])}
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        tf, bc = ray.get(uni_ref), ray.get(bi_ref)
        ids, ntoks, ppls = [], [], []
        for did, ts in zip(
            df["doc_id"], df["text"].fillna("").str.lower().str.findall(WORD_RE)
        ):
            if not ts:
                continue
            lp = math.log((tf[ts[0]] + 1.0) / (n_uni + v))
            for a, b in zip(ts, ts[1:]):
                lp += math.log((bc.get((a, b), 0) + 1.0) / (tf[a] + v))
            ids.append(int(did))
            ntoks.append(len(ts))
            ppls.append(round(math.exp(-lp / len(ts)), 6))
        return pd.DataFrame(
            {
                "doc_id": np.array(ids, dtype=np.int64),
                "n_tok": np.array(ntoks, dtype=np.int64),
                "ppl": np.array(ppls, dtype=np.float64),
            }
        )

    return (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(score, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


BIGRAM_PERPLEXITY_SQL = r"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS l FROM documents
), uni AS (
  SELECT unnest(l) AS w FROM d
), tf AS (
  SELECT w, COUNT(*)::BIGINT AS c FROM uni GROUP BY w
), tot AS (
  SELECT SUM(c)::BIGINT AS n, COUNT(*)::BIGINT AS v FROM tf
), bi AS (
  SELECT l[i] AS w1, l[i + 1] AS w2, COUNT(*)::BIGINT AS c
  FROM d, UNNEST(range(1, len(l))) AS r(i)
  GROUP BY 1, 2
), toks AS (
  SELECT doc_id, i, l[i] AS w, CASE WHEN i > 1 THEN l[i - 1] END AS prev
  FROM d, UNNEST(range(1, len(l) + 1)) AS r(i)
), lp AS (
  SELECT t.doc_id,
         CASE WHEN t.prev IS NULL
              THEN LN((tf.c + 1.0) / (tot.n + tot.v))
              ELSE LN((COALESCE(b.c, 0) + 1.0) / (tfp.c + tot.v))
         END AS lp
  FROM toks t
  JOIN tf ON tf.w = t.w
  LEFT JOIN tf tfp ON tfp.w = t.prev
  LEFT JOIN bi b ON b.w1 = t.prev AND b.w2 = t.w
  CROSS JOIN tot
)
SELECT doc_id, COUNT(*)::BIGINT AS n_tok,
       ROUND(EXP(-SUM(lp) / COUNT(*)), 6) AS ppl
FROM lp GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Source mixture weighting (temperature-smoothed domain balancing) -----------
# The data-mixing step of every multi-source pretraining run: raw token
# shares p_i are flattened with a sampling temperature (w_i ∝ p_i^α,
# α = 0.7 — the mT5 / multilingual-BERT exponent) so small domains are
# up-sampled without letting any one domain dominate.
#
# Scale shape: per-batch (source, docs, tokens) combiners, one tiny
# groupby-sum exchange; the final normalization is a driver fold over the
# DOMAIN-bounded table (the kmeans-partials contract — domains, not docs,
# bound the state). Both sides compute the same libm pow/divide chain and
# round at 6 dp.
MIX_ALPHA = 0.7


def source_mixture(sf_dir: str, alpha: float = MIX_ALPHA) -> pd.DataFrame:
    """(source, n_docs, n_tok, p, weight): raw token share and the
    α-temperature sampling weight per source."""
    from .text import WORD_RE

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].fillna("").str.lower().str.count(WORD_RE.pattern)
        g = (
            pd.DataFrame({"source": df["source"], "d": 1, "t": n.astype("int64")})
            .groupby("source", as_index=False)
            .sum()
        )
        return g.astype({"d": "int64", "t": "int64"})

    t = (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("d", alias_name="n_docs"), Sum("t", alias_name="n_tok"))
        .to_pandas()  # domain-bounded
        .sort_values("source")
        .reset_index(drop=True)
    )
    n = float(t["n_tok"].sum())
    pw = (t["n_tok"].to_numpy(np.float64) / n) ** alpha
    return pd.DataFrame(
        {
            "source": t["source"],
            "n_docs": t["n_docs"].astype("int64"),
            "n_tok": t["n_tok"].astype("int64"),
            "p": np.round(t["n_tok"].to_numpy(np.float64) / n, 6),
            "weight": np.round(pw / pw.sum(), 6),
        }
    )


SOURCE_MIXTURE_SQL = rf"""
WITH t AS (
  SELECT source, COUNT(*)::BIGINT AS n_docs,
         SUM(len(regexp_extract_all(lower(coalesce(text, '')), '\S+')))::BIGINT
           AS n_tok
  FROM documents GROUP BY source
), tot AS (SELECT SUM(n_tok)::DOUBLE AS n FROM t),
w AS (
  SELECT source, n_docs, n_tok,
         POWER(n_tok / (SELECT n FROM tot), {MIX_ALPHA}) AS pw
  FROM t
)
SELECT source, n_docs, n_tok,
       ROUND(n_tok / (SELECT n FROM tot), 6) AS p,
       ROUND(pw / (SELECT SUM(pw) FROM w), 6) AS weight
FROM w ORDER BY source
"""


# --------------------------------------------------------------------------
# Size-biased (PPS) document sampling ----------------------------------------
# Poisson sampling with inclusion probability proportional to size — the
# token-budget subsampling primitive ("give me ~10% of the TOKENS, not 10%
# of the documents") with Horvitz-Thompson weights so downstream counts
# stay unbiased. Deterministic: the coin is md5(doc_id) compared against
# n_chars × RATE — a pure per-row predicate, embarrassingly parallel,
# reproducible across runs/partitionings like the split op.
PPS_MOD = 1 << 32
PPS_RATE_NUM = 60_000  # inclusion prob = min(1, n_chars * NUM / 2^32)


def pps_sample(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_chars, weight): the size-biased sample with its
    Horvitz-Thompson weight 1/p rounded at 6 dp — both sides compute the
    single division 2^32/(n_chars*NUM) on exact integer-valued doubles."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        h = np.array(
            [
                int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16)
                for d in ids
            ],
            dtype=np.int64,
        )
        thr = df["n_chars"].astype("int64").to_numpy() * PPS_RATE_NUM
        keep = h < thr
        w = np.maximum(PPS_MOD / thr[keep], 1.0)  # 1/p; p capped at certainty
        return pd.DataFrame(
            {
                "doc_id": ids.to_numpy()[keep],
                "n_chars": df["n_chars"].astype("int64").to_numpy()[keep],
                "weight": np.round(w, 6),
            }
        )

    return (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        .map_batches(f, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


PPS_SAMPLE_SQL = f"""
SELECT doc_id, n_chars,
       ROUND(GREATEST({PPS_MOD}::DOUBLE / (n_chars * {PPS_RATE_NUM}), 1.0), 6)
         AS weight
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
      < n_chars * {PPS_RATE_NUM}
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Flesch reading-ease audit per source --------------------------------------
# The classic readability screen a curation pipeline runs next to the
# Gopher rules: flesch = 206.835 − 1.015·(words/sentences) −
# 84.6·(syllables/words), computed from corpus-exact integer totals per
# source. Heuristics are regex-countable so BOTH sides run the identical
# definition: words = [a-z]+ runs of the lowercased text, sentences =
# [.!?]+ runs (min 1 per doc), syllables = [aeiouy]+ vowel-group runs
# (vowel groups never span words, so the text-global count equals the
# per-word sum; zero-vowel tokens count 0 — documented simplification).
#
# Scale shape: per-batch integer partial sums (source, n_docs, W, S, Y)
# — text never leaves the batch — one source-bounded groupby-sum
# exchange, then the two inexact divisions happen ONCE per source on
# identical BIGINT totals, mirrored 6-dp.
_FLESCH_WORD = r"[a-z]+"
_FLESCH_SENT = r"[.!?]+"
_FLESCH_SYLL = r"[aeiouy]+"


def flesch_by_source(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        txt = df["text"].fillna("")
        low = txt.str.lower()
        w = low.str.count(_FLESCH_WORD).astype("int64")
        s = txt.str.count(_FLESCH_SENT).astype("int64").clip(lower=1)
        y = low.str.count(_FLESCH_SYLL).astype("int64")
        g = (
            pd.DataFrame({"source": df["source"], "w": w, "s": s, "y": y})
            .groupby("source", as_index=False)
            .agg(n_docs=("w", "size"), words=("w", "sum"),
                 sentences=("s", "sum"), syllables=("y", "sum"))
        )
        return g.astype(
            {"n_docs": "int64", "words": "int64",
             "sentences": "int64", "syllables": "int64"}
        )

    out = (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("words", alias_name="words"),
            Sum("sentences", alias_name="sentences"),
            Sum("syllables", alias_name="syllables"),
        )
        .to_pandas()  # source-bounded
        .astype({c: "int64" for c in ("n_docs", "words", "sentences", "syllables")})
    )
    out["flesch"] = [
        round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 6)
        for w, s, y in zip(out["words"], out["sentences"], out["syllables"])
    ]
    return out.sort_values("source").reset_index(drop=True)


FLESCH_BY_SOURCE_SQL = rf"""
SELECT source, COUNT(*)::BIGINT AS n_docs,
       SUM(len(regexp_extract_all(lower(COALESCE(text, '')), '{_FLESCH_WORD}')))::BIGINT AS words,
       SUM(GREATEST(len(regexp_extract_all(COALESCE(text, ''), '[.!?]+')), 1))::BIGINT AS sentences,
       SUM(len(regexp_extract_all(lower(COALESCE(text, '')), '{_FLESCH_SYLL}')))::BIGINT AS syllables,
       ROUND(206.835
             - 1.015 * (SUM(len(regexp_extract_all(lower(COALESCE(text, '')), '{_FLESCH_WORD}')))::DOUBLE
                        / SUM(GREATEST(len(regexp_extract_all(COALESCE(text, ''), '[.!?]+')), 1)))
             - 84.6 * (SUM(len(regexp_extract_all(lower(COALESCE(text, '')), '{_FLESCH_SYLL}')))::DOUBLE
                       / SUM(len(regexp_extract_all(lower(COALESCE(text, '')), '{_FLESCH_WORD}')))), 6)
         AS flesch
FROM documents GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# CCNet-style perplexity buckets ---------------------------------------------
# CCNet (Wenzek et al. 2020) splits every language's documents into
# head/middle/tail TERCILES of LM perplexity and trains on the head — the
# canonical quality-curation step for Common-Crawl text. Here the LM is the
# repo's add-one bigram model (text_bigram_perplexity) and the tercile is
# the exact NTILE(3) within language, ordered by (ppl, doc_id).
#
# Scale shape (the select_corpus histogram-rank idiom): the per-doc ppl pass
# is the streaming scorer; the tercile needs each doc's RANK within its
# language, computed without any language-wide sort: a (lang, ⌊ppl⌋)
# value-bucket histogram (lang × value-range bounded, ≪ corpus) folds to
# the driver, cumulative offsets broadcast back, and each (lang, vbucket)
# group sorts only ITS OWN rows — per-group size is value-skew-bounded,
# not corpus-bounded. Docs never cross more than the one groupby exchange.
CCNET_TILES = 3
_CCNET_LABELS = {1: "head", 2: "middle", 3: "tail"}


def _ntile_of(rank: np.ndarray, n: int, k: int) -> np.ndarray:
    """Exact SQL NTILE(k): first n%k tiles get ceil(n/k) rows."""
    q, r = divmod(n, k)
    big = r * (q + 1)
    return np.where(
        rank <= big,
        (rank - 1) // (q + 1) + 1 if q + 1 > 0 else 1,
        r + (np.maximum(rank - big - 1, 0) // max(q, 1)) + 1,
    ).astype(np.int64)


def ccnet_buckets(sf_dir: str) -> pd.DataFrame:
    """(doc_id, lang, ppl, bucket) — bucket ∈ head/middle/tail by the
    language-local perplexity tercile (NTILE(3) ORDER BY ppl, doc_id)."""
    import math

    import ray
    from ray.data.aggregate import Count

    from .corpus_stats import _corpus_term_stats
    from .text import WORD_RE

    uni = _corpus_term_stats(sf_dir).to_pandas()
    n_uni = int(uni["tf"].sum())
    v = len(uni)
    bi = _bigram_counts(sf_dir).to_pandas()
    uni_ref = ray.put(dict(zip(uni["term"], uni["tf"].astype(int))))
    bi_ref = ray.put(
        {(a, b): int(c) for a, b, c in zip(bi["w1"], bi["w2"], bi["cnt"])}
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        # same association as bigram_perplexity's scorer, plus lang and the
        # ⌊ppl⌋ value bucket for the rank lookup
        tf, bc = ray.get(uni_ref), ray.get(bi_ref)
        ids, langs, ppls = [], [], []
        for did, lang, ts in zip(
            df["doc_id"], df["lang"].fillna(""),
            df["text"].fillna("").str.lower().str.findall(WORD_RE),
        ):
            if not ts:
                continue
            lp = math.log((tf[ts[0]] + 1.0) / (n_uni + v))
            for a, b in zip(ts, ts[1:]):
                lp += math.log((bc.get((a, b), 0) + 1.0) / (tf[a] + v))
            ids.append(int(did))
            langs.append(lang)
            ppls.append(round(math.exp(-lp / len(ts)), 6))
        ppl = np.array(ppls, dtype=np.float64)
        return pd.DataFrame(
            {
                "doc_id": np.array(ids, dtype=np.int64),
                "lang": langs,
                "ppl": ppl,
                "vb": np.floor(ppl).astype(np.int64),
            }
        )

    scored = (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
        )
        .map_batches(score, batch_format="pandas")
        .materialize()  # narrow node-scale rows; read twice below
    )

    # (lang, vbucket) histogram — lang × value-range bounded, NOT corpus
    hist = (
        scored.groupby(["lang", "vb"])
        .aggregate(Count(alias_name="c"))
        .to_pandas()
        .sort_values(["lang", "vb"])
    )
    hist["start"] = hist.groupby("lang")["c"].cumsum() - hist["c"]
    starts = {
        (l, int(b)): int(s) for l, b, s in zip(hist["lang"], hist["vb"], hist["start"])
    }
    n_lang = hist.groupby("lang")["c"].sum().astype(int).to_dict()
    sref = ray.put((starts, n_lang))

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        starts_, n_lang_ = ray.get(sref)
        g = g.sort_values(["ppl", "doc_id"], kind="mergesort").reset_index(drop=True)
        lang, vb = g["lang"].iloc[0], int(g["vb"].iloc[0])
        rank = starts_[(lang, vb)] + np.arange(1, len(g) + 1)
        tile = _ntile_of(rank, n_lang_[lang], CCNET_TILES)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "lang": g["lang"],
                "ppl": g["ppl"].astype("float64"),
                "bucket": pd.Series(tile).map(_CCNET_LABELS),
            }
        )

    return (
        scored.groupby(["lang", "vb"])
        .map_groups(assign, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


CCNET_BUCKETS_SQL = f"""
WITH p AS ({BIGRAM_PERPLEXITY_SQL}),
dl AS (SELECT doc_id, lang FROM documents)
SELECT p.doc_id, dl.lang, p.ppl,
       CASE NTILE({CCNET_TILES}) OVER (
              PARTITION BY dl.lang ORDER BY p.ppl, p.doc_id)
            WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM p JOIN dl USING (doc_id)
ORDER BY p.doc_id
"""


# --------------------------------------------------------------------------
# Feature hashing (the hashing trick) ----------------------------------------
# Weinberger et al., "Feature Hashing for Large Scale Multitask Learning"
# (ICML 2009): map each token to one of FH_DIM buckets with a +/-1 sign so
# the hashed bag-of-words is an unbiased inner-product sketch — the
# fixed-width, vocabulary-free featurization a 100-TB pipeline feeds to
# linear quality models (ops/model.py) when even a pruned vocabulary
# broadcast is unwanted. The sparse sibling of embed_random_projection.
#
# Scale shape: pure map, zero exchange, no vocabulary state of any kind —
# bucket and sign are md5 functions of the token. All-integer output, so
# the SQL oracle (conditional sums per bucket) is exact with no rounding
# contract needed.

FH_DIM = 16


def _fh_bucket_sign(tok: str) -> tuple[int, int]:
    hx = hashlib.md5(tok.encode("utf-8")).hexdigest()
    return int(hx[:8], 16) % FH_DIM, 1 if int(hx[8:16], 16) % 2 == 0 else -1


def feature_hashing(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_tokens, f0..f{FH_DIM-1}): signed hashed token counts."""
    from .text import WORD_RE

    def block(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        vecs = np.zeros((len(df), FH_DIM), dtype=np.int64)
        n_tok = np.zeros(len(df), dtype=np.int64)
        for r, ts in enumerate(toks):
            n_tok[r] = len(ts)
            for t in ts:
                b, s = _fh_bucket_sign(t)
                vecs[r, b] += s
        out = {"doc_id": df["doc_id"].astype("int64"), "n_tokens": n_tok}
        for j in range(FH_DIM):
            out[f"f{j}"] = vecs[:, j]
        return pd.DataFrame(out)

    return (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(block, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def feature_hashing_sql(d: int = FH_DIM) -> str:
    cols = ",\n       ".join(
        f"COALESCE(SUM(CASE WHEN ('0x' || substr(md5(tok), 1, 8))::BIGINT % {d} = {j}"
        f" THEN CASE WHEN ('0x' || substr(md5(tok), 9, 8))::BIGINT % 2 = 0"
        f" THEN 1 ELSE -1 END ELSE 0 END), 0)::BIGINT AS f{j}"
        for j in range(d)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
  FROM documents
)
SELECT d.doc_id,
       COALESCE(t.n, 0)::BIGINT AS n_tokens,
       {{cols}}
FROM documents d
LEFT JOIN (
  SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id
) t ON t.doc_id = d.doc_id
LEFT JOIN toks k ON k.doc_id = d.doc_id
GROUP BY d.doc_id, t.n
ORDER BY d.doc_id
""".replace("{cols}", cols)


FEATURE_HASHING_SQL = feature_hashing_sql()
