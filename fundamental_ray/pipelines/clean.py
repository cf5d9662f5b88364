"""The flagship training-data cleaning composite: quality filter → exact
dedup → near-dup cluster drop → benchmark decontamination, composed from
the primitives in ops/ into ONE auditable per-document verdict table.

This is the pipeline a pre-training data team actually runs end-to-end;
each stage here is the registered operator it reuses:

  rule_quality         — ops/corpus_stats.gopher_filter's rule conjunction
  rule_exact_keep      — ops/dedup.exact_dedup (md5 groups, keep min id)
  rule_neardup_keep    — ops/dedup.duplicate_clusters (MinHash/LSH pairs →
                         connected components, keep the representative)
  rule_decontaminated  — ops/text.decontaminate (benchmark word-8-gram
                         overlap; benchmark slice itself is excluded)
  kept                 — the conjunction

Scale shape — ONE streaming signal pass, then two HASH-PARTITIONED JOINS
(no duplicate-population-proportional driver state):
- the per-doc signal pass emits (doc_id, text_hash, rule_quality,
  rule_decontaminated) — narrow rows, text never leaves the pass;
- exact-dedup keep is an inner ``Dataset.join`` on text_hash against the
  distributed exact-dedup aggregate (every hash has exactly one row there,
  so the join is row-count-preserving) — at a real 30-50 % pre-training
  dup rate the old {hash → keep_id} ``ray.put`` dict was corpus-scale;
- near-dup keep is a left-outer ``Dataset.join`` on doc_id against the
  connected-components cluster table (clustered docs only);
- the ONLY remaining broadcast is the benchmark gram set, which is
  eval-suite-sized by construction (bounded by the benchmark slice, not
  by the corpus or its duplicate population).
"""

from __future__ import annotations
from fundamental_ray.sources.parquet import arrowize, read_parquet_clean

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data

from ..ops.corpus_stats import (
    G_MAX_MWL, G_MAX_WORDS, G_MIN_DISTINCT_RATIO, G_MIN_MWL, G_MIN_WORDS,
    gopher_metrics, gopher_rules,
)
from ..ops.dedup import duplicate_clusters_ds, exact_dedup_ds
from ..ops.text import DECON_MOD, DECON_N, WORD_RE, grams_of

def _join_partitions() -> int:
    """Hash-join partition count scaled to the session: Ray's hash-shuffle
    join pins ``partitions × 0.125`` CPUs of aggregator actors PER JOIN for
    the whole pipeline lifetime; two concurrent joins at 16 partitions eat
    4.0 CPUs — a hard deadlock on a 4-CPU test session (aggregators hold
    every core, upstream read tasks never run). cores//2 keeps the two
    joins' aggregators at ≤¼ of the cluster and scales back up to 16
    partitions from 32 cores."""
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    return max(2, min(16, ncpu // 2))


def clean_corpus(sf_dir: str, neardup_threshold: float = 0.5) -> pd.DataFrame:
    """Per-document verdicts for the full cleaning pipeline (all docs, all
    stage flags — auditable, `WHERE kept` is the corpus that ships)."""
    join_partitions = _join_partitions()
    # -- the one bounded broadcast: benchmark gram set (distributed build)
    def bench_grams(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.loc[df["doc_id"] % DECON_MOD == 0, "text"].fillna("")
        out = set()
        for ts in sub.str.findall(WORD_RE):
            out |= grams_of(ts, DECON_N)
        # explicit object dtype: an empty batch would otherwise emit a
        # float64 'gram' column and produce a cross-block schema mismatch
        return pd.DataFrame({"gram": pd.Series(sorted(out), dtype="object")})

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    bench = set(
        docs.map_batches(bench_grams, batch_format="pandas").to_pandas()["gram"]
    )
    bref = ray.put(bench)

    # -- streaming signal pass: narrow per-doc rows, text stays here -----
    def signals(df: pd.DataFrame) -> pd.DataFrame:
        bgrams = ray.get(bref)
        txt = df["text"].fillna("")
        toks_cs = txt.str.findall(WORD_RE)  # case-sensitive (grams, dedup)
        toks = txt.str.lower().str.findall(WORD_RE)  # lowercase (quality)
        n_words, mwl, dr = gopher_metrics(toks)
        rule_quality = gopher_rules(n_words, mwl, dr)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        is_bench = ids % DECON_MOD == 0
        overlap = np.array(
            [len(bgrams & grams_of(ts, DECON_N)) for ts in toks_cs],
            dtype=np.int64,
        )
        # Arrow out: pandas-born blocks would carry unhashable b'pandas'
        # schema metadata into the hash-join aggregators (warning storms)
        import pyarrow as pa

        return pa.table(
            {
                "doc_id": pa.array(ids),
                "text_hash": pa.array(
                    [hashlib.md5(t.encode("utf-8")).hexdigest() for t in txt],
                    pa.string(),
                ),
                "rule_quality": pa.array(np.asarray(rule_quality, dtype=bool)),
                "rule_decontaminated": pa.array((~is_bench) & (overlap == 0)),
            }
        )

    sig = docs.map_batches(signals, batch_format="pandas")

    # -- hash-partitioned join 1: exact-dedup keep (text_hash partitions).
    # Every text_hash has exactly ONE aggregate row, so the inner join is
    # row-count-preserving; rule_exact_keep = (keep_doc_id == doc_id).
    # arrowize: the aggregate can emit pandas blocks whose implicit Arrow
    # conversion inside the join aggregators re-attaches unhashable schema
    # metadata (sources/parquet.py) — rebuild clean Arrow + prune columns
    ed = arrowize(exact_dedup_ds(sf_dir), columns=["text_hash", "keep_doc_id"])
    sig = sig.join(
        ed, join_type="inner", num_partitions=join_partitions, on=("text_hash",)
    )

    # -- hash-partitioned join 2: near-dup clusters (doc_id partitions).
    # Left-outer: unclustered docs get a NULL cluster_id and keep=True.
    cl = duplicate_clusters_ds(sf_dir, neardup_threshold)
    if cl is not None:
        sig = sig.join(
            arrowize(cl),
            join_type="left_outer",
            num_partitions=join_partitions,
            on=("doc_id",),
        )

    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        rule_exact = df["keep_doc_id"].to_numpy(dtype=np.int64) == ids
        if "cluster_id" in df.columns:
            cid = df["cluster_id"]
            rule_neardup = (cid.isna() | (cid == df["doc_id"])).to_numpy()
        else:
            rule_neardup = np.ones(len(df), dtype=bool)
        rq = df["rule_quality"].to_numpy(dtype=bool)
        rd = df["rule_decontaminated"].to_numpy(dtype=bool)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "rule_quality": rq,
                "rule_exact_keep": rule_exact,
                "rule_neardup_keep": rule_neardup,
                "rule_decontaminated": rd,
                "kept": rq & rule_exact & rule_neardup & rd,
            }
        )

    return (
        sig.map_batches(verdict, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def clean_corpus_sql(neardup_pair_sql: str) -> str:
    """DuckDB mirror; ``neardup_pair_sql`` is the cluster-assignment SQL
    (recursive-CTE closure over the minhash artifact — supplied by the
    registry's lazy-oracle builder, which owns the artifact paths)."""
    return rf"""
WITH nd AS ({neardup_pair_sql}),
t AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '\S+') AS toks,
         regexp_extract_all(text, '\S+') AS w
  FROM documents
), q AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_words,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                   / len(toks) END AS mwl,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE len(list_distinct(toks))::DOUBLE / len(toks) END AS dr
  FROM t
), ex AS (
  SELECT doc_id,
         doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS rule_exact_keep
  FROM documents
), g AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(w) - {DECON_N} + 1, 0) + 1),
           i -> array_to_string(w[i::INT : i::INT + {DECON_N} - 1], ' '))) AS grams
  FROM t
), bench AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % {DECON_MOD} = 0
), hits AS (
  SELECT dg.doc_id, count(*) AS n
  FROM (SELECT doc_id, unnest(grams) AS gram FROM g) dg
  JOIN bench USING (gram) GROUP BY dg.doc_id
)
SELECT q.doc_id,
       (q.n_words BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS}
        AND q.mwl >= {G_MIN_MWL} AND q.mwl <= {G_MAX_MWL}
        AND q.dr >= {G_MIN_DISTINCT_RATIO}) AS rule_quality,
       ex.rule_exact_keep,
       q.doc_id NOT IN (SELECT doc_id FROM nd WHERE doc_id <> cluster_id)
         AS rule_neardup_keep,
       (q.doc_id % {DECON_MOD} <> 0 AND coalesce(hits.n, 0) = 0)
         AS rule_decontaminated,
       ((q.n_words BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS}
         AND q.mwl >= {G_MIN_MWL} AND q.mwl <= {G_MAX_MWL}
         AND q.dr >= {G_MIN_DISTINCT_RATIO})
        AND ex.rule_exact_keep
        AND q.doc_id NOT IN (SELECT doc_id FROM nd WHERE doc_id <> cluster_id)
        AND q.doc_id % {DECON_MOD} <> 0 AND coalesce(hits.n, 0) = 0) AS kept
FROM q
JOIN ex USING (doc_id)
LEFT JOIN hits ON q.doc_id = hits.doc_id
ORDER BY q.doc_id
"""


# --------------------------------------------------------------------------
# The DELTA cleaning loop — the actual 100-TB operating mode: a NEW shard
# (delta = doc_id % 5 == 0, the dedup_incremental convention) is cleaned
# against the EXISTING corpus (base = the rest) without ever re-touching
# base text:
#
#   rule_quality        — gopher rules on the delta docs (map-only)
#   rule_exact_keep     — ops/dedup.incremental_dedup: the delta joins the
#                         PERSISTENT bucket-partitioned base hash index
#                         (built once, content-fingerprint cached); only
#                         delta-sized rows cross its exchange
#   rule_neardup_keep   — ops/bloom.bloom_delta_dedup(5, 0): the base
#                         chunk filter is a CONSTANT 2 MiB bitmap
#                         (position-distinct exchange bounded by BLOOM_M,
#                         not by corpus size), broadcast once, probed
#                         shuffle-free by the delta
#   rule_decontaminated — benchmark 8-gram overlap (bench gram set is
#                         eval-suite-bounded by construction)
#
# CLEAN_DELTA_LINEAGE records the rows that crossed each exchange so the
# delta-boundedness claim is checkable (test-pinned): every term is
# O(delta), O(BLOOM_M) or O(eval suite) — never O(base corpus).

CLEAN_DELTA_LINEAGE: dict = {}

DELTA_MOD = 5  # dedup_incremental's base/delta split
DELTA_RESIDUE = 0


def clean_corpus_delta(sf_dir: str) -> pd.DataFrame:
    """Per-DELTA-document verdicts for the incremental cleaning pipeline
    (one row per delta doc; `WHERE kept` is what the new shard ships)."""
    from ..ops.bloom import BLOOM_M, bloom_delta_dedup
    from ..ops.dedup import incremental_dedup

    # -- exact: delta vs persistent base index (delta-sized exchange) ----
    inc = incremental_dedup(sf_dir)
    exact = pd.DataFrame(
        {
            "doc_id": inc["doc_id"],
            "rule_exact_keep": (inc["keep_doc_id"] == inc["doc_id"]).to_numpy(),
        }
    )

    # -- near-dup: delta vs constant-size base Bloom filter --------------
    bl = bloom_delta_dedup(sf_dir, DELTA_MOD, DELTA_RESIDUE)

    # -- quality + decontamination signal pass over the DELTA ------------
    def bench_grams(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.loc[df["doc_id"] % DECON_MOD == 0, "text"].fillna("")
        out = set()
        for ts in sub.str.findall(WORD_RE):
            out |= grams_of(ts, DECON_N)
        return pd.DataFrame({"gram": pd.Series(sorted(out), dtype="object")})

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    bench = set(
        docs.map_batches(bench_grams, batch_format="pandas").to_pandas()["gram"]
    )
    bref = ray.put(bench)

    def signals(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] % DELTA_MOD == DELTA_RESIDUE]
        bgrams = ray.get(bref)
        txt = df["text"].fillna("")
        toks_cs = txt.str.findall(WORD_RE)
        toks = txt.str.lower().str.findall(WORD_RE)
        n_words, mwl, dr = gopher_metrics(toks)
        rule_quality = gopher_rules(n_words, mwl, dr)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        is_bench = ids % DECON_MOD == 0
        overlap = np.array(
            [len(bgrams & grams_of(ts, DECON_N)) for ts in toks_cs],
            dtype=np.int64,
        )
        return pd.DataFrame(
            {
                "doc_id": ids,
                "rule_quality": np.asarray(rule_quality, dtype=bool),
                "rule_decontaminated": (~is_bench) & (overlap == 0),
            }
        )

    sig = docs.map_batches(signals, batch_format="pandas").to_pandas()

    # -- delta-sized merge + verdict -------------------------------------
    out = (
        sig.merge(exact, on="doc_id", how="left")
        .merge(bl[["doc_id", "is_dup"]], on="doc_id", how="left")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["rule_exact_keep"] = out["rule_exact_keep"].fillna(True).astype(bool)
    out["rule_neardup_keep"] = ~out["is_dup"].fillna(False).astype(bool)
    out = out.drop(columns=["is_dup"])
    out["kept"] = (
        out["rule_quality"] & out["rule_exact_keep"]
        & out["rule_neardup_keep"] & out["rule_decontaminated"]
    )
    CLEAN_DELTA_LINEAGE.clear()
    CLEAN_DELTA_LINEAGE.update(
        {
            "delta_rows": int(len(out)),
            "exact_exchange_rows": int(len(inc)),  # delta-sized
            "bloom_probe_rows": int(len(bl)),  # delta-sized, no exchange
            "bloom_filter_bits": int(BLOOM_M),  # constant
            "bench_gram_rows": int(len(bench)),  # eval-suite-bounded
        }
    )
    return out[
        ["doc_id", "rule_quality", "rule_exact_keep", "rule_neardup_keep",
         "rule_decontaminated", "kept"]
    ]


def clean_corpus_delta_sql(bloom_subq: str) -> str:
    """DuckDB mirror; ``bloom_subq`` is ops/bloom.bloom_delta_sql(5, 0)."""
    return rf"""
WITH delta AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % {DELTA_MOD} = {DELTA_RESIDUE}
), t AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '\S+') AS toks
  FROM delta
), q AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_words,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                   / len(toks) END AS mwl,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE len(list_distinct(toks))::DOUBLE / len(toks) END AS dr
  FROM t
), base AS (
  SELECT md5(COALESCE(text, '')) AS text_hash, MIN(doc_id) AS base_keep
  FROM documents WHERE doc_id % {DELTA_MOD} <> {DELTA_RESIDUE} GROUP BY 1
), dh AS (
  SELECT doc_id, md5(COALESCE(text, '')) AS text_hash FROM delta
), dmin AS (
  SELECT text_hash, MIN(doc_id) AS delta_keep FROM dh GROUP BY 1
), ex AS (
  SELECT dh.doc_id,
         (b.base_keep IS NULL AND dh.doc_id = m.delta_keep)
           AS rule_exact_keep
  FROM dh LEFT JOIN base b USING (text_hash) JOIN dmin m USING (text_hash)
), blm AS (
  SELECT doc_id, is_dup FROM ({bloom_subq}) s
), gall AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(w) - {DECON_N} + 1, 0) + 1),
           i -> array_to_string(w[i::INT : i::INT + {DECON_N} - 1], ' ')))
           AS grams
  FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents)
), bench AS (
  SELECT DISTINCT unnest(grams) AS gram FROM gall
  WHERE doc_id % {DECON_MOD} = 0
), hits AS (
  SELECT dg.doc_id, count(*) AS n
  FROM (SELECT doc_id, unnest(grams) AS gram FROM gall
        WHERE doc_id % {DELTA_MOD} = {DELTA_RESIDUE}) dg
  JOIN bench USING (gram) GROUP BY dg.doc_id
)
SELECT q.doc_id,
       (q.n_words BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS}
        AND q.mwl >= {G_MIN_MWL} AND q.mwl <= {G_MAX_MWL}
        AND q.dr >= {G_MIN_DISTINCT_RATIO}) AS rule_quality,
       ex.rule_exact_keep,
       NOT COALESCE(blm.is_dup, FALSE) AS rule_neardup_keep,
       (q.doc_id % {DECON_MOD} <> 0 AND COALESCE(hits.n, 0) = 0)
         AS rule_decontaminated,
       ((q.n_words BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS}
         AND q.mwl >= {G_MIN_MWL} AND q.mwl <= {G_MAX_MWL}
         AND q.dr >= {G_MIN_DISTINCT_RATIO})
        AND ex.rule_exact_keep
        AND NOT COALESCE(blm.is_dup, FALSE)
        AND q.doc_id % {DECON_MOD} <> 0 AND COALESCE(hits.n, 0) = 0) AS kept
FROM q
JOIN ex ON ex.doc_id = q.doc_id
LEFT JOIN blm ON blm.doc_id = q.doc_id
LEFT JOIN hits ON hits.doc_id = q.doc_id
ORDER BY q.doc_id
"""
