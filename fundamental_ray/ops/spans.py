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
