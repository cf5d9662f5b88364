"""Round-4 training-data ops: duplicated-substring span detection (the
exact-substring-dedup primitive of Lee et al., "Deduplicating Training
Data Makes Language Models Better", ACL 2022), source-level quality
gating (the RefinedWeb/FineWeb "drop bad hosts wholesale" idiom), and
temperature-based language mixing (the multilingual p_l ∝ n_l^α sampling
rule of mBERT/XLM-R).

Scale shape:
- ``dedup_substring_spans`` ships only NARROW rows (int64 window hash,
  doc_id, pos) through the exchanges — document text never leaves the
  explode stage. Duplicated-window detection is a vectorized
  ``groupby(h).aggregate(Count)`` (sort-based shuffle, no per-group
  Python), membership is a hash-partitioned ``Dataset.join`` against the
  duplicate-hash table (bounded by the DUPLICATED window population, the
  same bound chunk-dedup's drop index lives under — never a driver
  broadcast), and maximal-run merging is a per-doc ``map_groups`` over
  only the docs that own duplicated windows.
- ``source_quality_filter`` pre-aggregates per batch to |sources| rows
  (classic combiner): the global groupby shuffles a constant number of
  rows per block regardless of corpus size, and the median cut happens
  over the |sources|-row result.
- ``temperature_mix`` is the same combiner shape over |langs| rows.

Window hashes use the md5-60-bit-prefix convention of chunk dedup
(ops/dedup.py:860) — one flat int64 column through the shuffle; at the
100-TB design point widen to the (hi, lo) int64 pair exactly as
FR_CHUNK_HASH_BITS=128 does there (birthday bound documented in that
module). The oracle compares gram STRINGS, so any hash collision at test
scale would surface as a red row.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from fundamental_ray.sources.parquet import arrowize, read_parquet_clean

SPAN_K = 8  # tokens per window (Lee et al. use 50 BPE tokens; 8 words at bench vocab)
MIX_ALPHA = 0.3  # temperature exponent (XLM-R's alpha)
MIX_BUDGET = 100_000  # sampled-corpus size the mix plan is computed for


def _join_partitions() -> int:
    """Hash-join partition budget (the pipelines/clean.py sizing rationale:
    Ray pins ``partitions x 0.125`` aggregator CPUs per join for the
    pipeline's lifetime, so cap at a quarter of the session)."""
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(16, ncpu // 2))


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


# --------------------------------------------------------------------------
# Duplicated-substring spans ------------------------------------------------


def _explode_windows(df: pd.DataFrame) -> pa.Table:
    """(doc_id, text) -> narrow (h:int64, doc_id:int64, pos:int32) rows,
    one per K-token window at stride 1. Text stays in this stage."""
    hs: list[int] = []
    ids: list[int] = []
    pos: list[int] = []
    for doc_id, text in zip(
        df["doc_id"].to_numpy(dtype=np.int64), df["text"].fillna("")
    ):
        toks = text.split(" ")
        for i in range(len(toks) - SPAN_K + 1):
            hs.append(_h60(" ".join(toks[i : i + SPAN_K])))
            ids.append(int(doc_id))
            pos.append(i)
    return pa.table(
        {
            "h": pa.array(hs, pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
            "pos": pa.array(pos, pa.int32()),
        }
    )


def _merge_islands(df: pd.DataFrame) -> pd.DataFrame:
    """One doc's duplicated window positions -> maximal consecutive runs
    (gaps-and-islands): span covers tokens [span_start, span_end]."""
    p = np.sort(df["pos"].to_numpy(dtype=np.int64))
    grp = p - np.arange(len(p))
    starts = np.flatnonzero(np.concatenate(([True], grp[1:] != grp[:-1])))
    lengths = np.diff(np.append(starts, len(p)))
    return pd.DataFrame(
        {
            "doc_id": np.full(len(starts), int(df["doc_id"].iloc[0]), dtype=np.int64),
            "span_start": p[starts],
            "span_end": p[starts + lengths - 1] + SPAN_K - 1,
            "n_windows": lengths.astype(np.int64),
        }
    )


def dedup_substring_spans(sf_dir: str) -> pd.DataFrame:
    """Every maximal duplicated span of >= SPAN_K consecutive tokens:
    (doc_id, span_start, span_end inclusive token indices, n_windows).

    A K-token window is 'duplicated' when its text occurs at more than one
    (doc, pos) in the corpus; a span is a maximal run of consecutive
    duplicated window starts — the unit Lee et al.'s ExactSubstr dedup
    removes. Dataflow: explode -> Count per hash (one sort shuffle of
    narrow rows) -> inner hash-join of the narrow rows against the
    duplicate-hash table (duplicate-population-bounded, partitioned — not
    broadcast) -> per-doc gaps-and-islands merge (one doc_id exchange of
    only the duplicated positions)."""
    grams = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(_explode_windows, batch_format="pandas")
    )
    def only_dups(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater(t["n_occ"], 1)).select(["h"])

    # NOTE: grams is a lazy Dataset consumed twice (Count aggregate + join
    # probe side), so the explode pass runs twice — the same 2-pass trade
    # chunk dedup makes (ops/dedup.py) to keep both exchanges narrow.
    dup_hashes = arrowize(
        grams.groupby("h").aggregate(Count(alias_name="n_occ")),
        columns=["h", "n_occ"],
    ).map_batches(only_dups, batch_format="pyarrow")
    dup_pos = grams.join(
        dup_hashes,
        join_type="inner",
        num_partitions=_join_partitions(),
        on=("h",),
    )
    out = (
        dup_pos.groupby("doc_id")
        .map_groups(_merge_islands, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "span_start": pd.Series(dtype="int64"),
                "span_end": pd.Series(dtype="int64"),
                "n_windows": pd.Series(dtype="int64"),
            }
        )
    return (
        out.astype(
            {"doc_id": "int64", "span_start": "int64", "span_end": "int64", "n_windows": "int64"}
        )
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )


DEDUP_SUBSTRING_SPANS_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
g AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(ws[u.i:u.i + {SPAN_K} - 1], ' ') AS gram
  FROM w JOIN LATERAL unnest(range(1, len(ws) - {SPAN_K} + 2)) u(i) ON true
),
dup AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1
),
d AS (
  SELECT doc_id, pos FROM g JOIN dup USING (gram)
),
isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM d
)
SELECT doc_id,
       MIN(pos)::BIGINT - 1 AS span_start,
       MAX(pos)::BIGINT - 1 + {SPAN_K} - 1 AS span_end,
       COUNT(*)::BIGINT AS n_windows
FROM isl
GROUP BY doc_id, grp
ORDER BY doc_id, span_start
"""


# --------------------------------------------------------------------------
# Source-level quality gate --------------------------------------------------


def source_quality_filter(sf_dir: str) -> pd.DataFrame:
    """Per-source quality gate: mean token length per SOURCE (ratio of two
    integer sums — merge-order-invariant), kept iff the source's ratio is
    at or above the median of all source ratios. The RefinedWeb idiom:
    judge the host/source wholesale, drop or keep every document it
    contributed. Combiner shape: each batch reduces to |sources| partial
    rows before the (tiny) global groupby."""

    def partial(df: pd.DataFrame) -> pa.Table:
        txt = df["text"].fillna("")
        g = (
            pd.DataFrame(
                {
                    "source": df["source"],
                    "tc": txt.str.len().astype("int64"),
                    "tw": (txt.str.count(" ") + 1).astype("int64"),
                }
            )
            .groupby("source", as_index=False)
            .agg(n_docs=("tc", "size"), tc=("tc", "sum"), tw=("tw", "sum"))
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "n_docs": pa.array(g["n_docs"], pa.int64()),
                "tc": pa.array(g["tc"], pa.int64()),
                "tw": pa.array(g["tw"], pa.int64()),
            }
        )

    per = (
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("tc", alias_name="tc"),
            Sum("tw", alias_name="tw"),
        )
        .to_pandas()
    )
    ratio = per["tc"].to_numpy(dtype=np.float64) / per["tw"].to_numpy(dtype=np.float64)
    med = float(np.median(ratio))
    out = pd.DataFrame(
        {
            "source": per["source"],
            "n_docs": per["n_docs"].astype("int64"),
            "avg_tok_len": np.round(ratio, 6),
            "kept": ratio >= med,
        }
    )
    return out.sort_values("source").reset_index(drop=True)


SOURCE_QUALITY_FILTER_SQL = """
WITH per AS (
  SELECT source, COUNT(*)::BIGINT AS n_docs,
         SUM(length(text))::BIGINT AS tc,
         SUM(len(string_split(text, ' ')))::BIGINT AS tw
  FROM documents GROUP BY source
),
m AS (SELECT median(tc::DOUBLE / tw) AS med FROM per)
SELECT source, n_docs,
       ROUND(tc::DOUBLE / tw, 6) AS avg_tok_len,
       (tc::DOUBLE / tw >= (SELECT med FROM m)) AS kept
FROM per ORDER BY source
"""


# --------------------------------------------------------------------------
# Temperature language mixing ------------------------------------------------


def temperature_mix(sf_dir: str) -> pd.DataFrame:
    """Multilingual temperature sampling plan: p_l = n_l^alpha / sum_m
    n_m^alpha (alpha = MIX_ALPHA), expected docs for a MIX_BUDGET-doc
    sampled corpus = floor(round(p_l, 6) * budget) — the floor runs on the
    ROUNDED share so the plan is bit-stable against partial-sum order.
    Combiner shape: |langs| partial rows per batch."""

    def partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("lang", as_index=False).agg(n_docs=("lang", "size"))
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "n_docs": pa.array(g["n_docs"], pa.int64()),
            }
        )

    per = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["lang"])
        .map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    w = per["n_docs"].to_numpy(dtype=np.float64) ** MIX_ALPHA
    share = np.round(w / w.sum(), 6)
    return pd.DataFrame(
        {
            "lang": per["lang"],
            "n_docs": per["n_docs"].astype("int64"),
            "share": share,
            "expected_docs": np.floor(share * MIX_BUDGET).astype("int64"),
        }
    )


TEMPERATURE_MIX_SQL = f"""
WITH per AS (
  SELECT lang, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY lang
),
s AS (
  SELECT lang, n_docs,
         ROUND(POWER(n_docs, {MIX_ALPHA}) / SUM(POWER(n_docs, {MIX_ALPHA})) OVER (), 6) AS share
  FROM per
)
SELECT lang, n_docs, share,
       FLOOR(share * {MIX_BUDGET})::BIGINT AS expected_docs
FROM s ORDER BY lang
"""


# --------------------------------------------------------------------------
# Content-defined chunking dedup ---------------------------------------------

CDC_D = 8  # boundary divisor: a word ends a chunk when md5_60(word) % D == 0


def _cdc_boundary(words: list[str]) -> np.ndarray:
    return np.array([_h60(w) % CDC_D == 0 for w in words], dtype=bool)


def _cdc_chunks(text: str) -> list[str]:
    """Word-gear-hash content-defined chunking: a chunk runs up to AND
    INCLUDING each boundary word. Boundaries are a pure function of word
    CONTENT, so inserting a word resynchronizes at the next boundary —
    only the containing chunk changes (the CDC property fixed-width
    chunking lacks; rsync/LBFS idiom at word granularity)."""
    words = text.split(" ")
    b = _cdc_boundary(words)
    out: list[str] = []
    start = 0
    for end in np.flatnonzero(b):
        out.append(" ".join(words[start : end + 1]))
        start = end + 1
    if start < len(words):
        out.append(" ".join(words[start:]))
    return out


def dedup_cdc_chunks(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide duplicated CDC chunks: (chunk_hash, n_words, n_occ,
    n_docs) for every chunk text occurring more than once.

    Dataflow: per-batch explode to narrow (chunk_hash, doc_id) rows —
    chunk text reduces to its md5 inside the explode stage — then
    groupby(hash, doc) Count (one exchange) and a tiny second groupby on
    hash for the occurrence/doc rollup. chunk_hash is the full md5 hex
    here so the oracle compares digests directly; at the 100-TB point
    carry the (hi, lo) int64 pair instead (ops/dedup.py:860 convention)."""

    def explode(df: pd.DataFrame) -> pa.Table:
        hs: list[str] = []
        ids: list[int] = []
        nw: list[int] = []
        for doc_id, text in zip(
            df["doc_id"].to_numpy(dtype=np.int64), df["text"].fillna("")
        ):
            for ch in _cdc_chunks(text):
                hs.append(hashlib.md5(ch.encode("utf-8")).hexdigest())
                ids.append(int(doc_id))
                nw.append(ch.count(" ") + 1)
        return pa.table(
            {
                "chunk_hash": pa.array(hs, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    per_doc = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(explode, batch_format="pandas")
        .groupby(["chunk_hash", "doc_id"])
        .aggregate(Count(alias_name="occ"), Max("n_words", alias_name="n_words"))
    )
    rolled = (
        arrowize(per_doc, columns=["chunk_hash", "occ", "n_words"])
        .groupby("chunk_hash")
        .aggregate(
            Sum("occ", alias_name="n_occ"),
            Count(alias_name="n_docs"),
            Max("n_words", alias_name="n_words"),
        )
        .to_pandas()
    )
    out = rolled[rolled["n_occ"] > 1][
        ["chunk_hash", "n_words", "n_occ", "n_docs"]
    ].astype({"n_words": "int64", "n_occ": "int64", "n_docs": "int64"})
    return out.sort_values("chunk_hash").reset_index(drop=True)


DEDUP_CDC_CHUNKS_SQL = f"""
WITH w AS (
  SELECT doc_id, u.i AS pos, ws[u.i] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
  JOIN LATERAL unnest(range(1, len(ws) + 1)) u(i) ON true
),
f AS (
  SELECT doc_id, pos, word,
         CASE WHEN ('0x' || substr(md5(word), 1, 15))::BIGINT % {CDC_D} = 0
              THEN 1 ELSE 0 END AS b
  FROM w
),
c AS (
  SELECT doc_id, pos, word,
         COALESCE(SUM(b) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
  FROM f
),
ch AS (
  SELECT doc_id, cid, string_agg(word, ' ' ORDER BY pos) AS chunk
  FROM c GROUP BY doc_id, cid
),
agg AS (
  SELECT md5(chunk) AS chunk_hash,
         MIN(len(string_split(chunk, ' ')))::BIGINT AS n_words,
         COUNT(*)::BIGINT AS n_occ,
         COUNT(DISTINCT doc_id)::BIGINT AS n_docs
  FROM ch GROUP BY 1
)
SELECT chunk_hash, n_words, n_occ, n_docs
FROM agg WHERE n_occ > 1 ORDER BY chunk_hash
"""


# --------------------------------------------------------------------------
# Deterministic global shuffle ranks ------------------------------------------

SHUFFLE_BUCKETS = 256  # ordered range partitions: first md5 hex byte


def shuffle_ranks(sf_dir: str) -> pd.DataFrame:
    """Global training-order assignment: every doc gets the dense rank of
    its md5(doc_id) key — the deterministic corpus shuffle a multi-epoch
    training run recomputes bit-identically on any cluster.

    NO global sort: the md5 key's first byte is an ORDERED range
    partition, so rank = (exclusive prefix over the 256 bucket counts —
    a constant-size driver fold) + local rank within the bucket (one
    groupby exchange + per-bucket sort). The same two-pass scan shape as
    text_pack_sequences (ops/pack.py)."""

    def keyed(df: pd.DataFrame) -> pa.Table:
        ks = [
            hashlib.md5(str(int(d)).encode()).hexdigest()
            for d in df["doc_id"].to_numpy(dtype=np.int64)
        ]
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(dtype=np.int64), pa.int64()),
                "key": pa.array(ks, pa.string()),
                "bucket": pa.array([int(k[:2], 16) for k in ks], pa.int64()),
            }
        )

    keys = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(keyed, batch_format="pandas")
        .materialize()  # narrow (id, 32-char key, bucket); scanned twice
    )
    counts = (
        keys.groupby("bucket").aggregate(Count(alias_name="n")).to_pandas()
        .sort_values("bucket")
    )
    counts["base"] = counts["n"].cumsum() - counts["n"]
    base_ref = ray.put(dict(zip(counts["bucket"].astype(int), counts["base"].astype(int))))

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(base_ref)[int(g["bucket"].iloc[0])]
        g = g.sort_values("key", kind="mergesort")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
                "shuffle_rank": base + np.arange(len(g), dtype=np.int64),
            }
        )

    return (
        keys.groupby("bucket")
        .map_groups(rank, batch_format="pandas")
        .to_pandas()
        .sort_values("shuffle_rank")
        .reset_index(drop=True)
    )


SHUFFLE_RANKS_SQL = """
SELECT doc_id,
       (ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1)::BIGINT
         AS shuffle_rank
FROM documents ORDER BY shuffle_rank
"""
