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

Scale shape — the whole composite is ONE streaming verdict pass plus three
bounded broadcasts:
- the distributed exact-dedup aggregate is reduced to {hash → keep_id}
  for DUPLICATED hashes only (bounded by duplicate groups, not corpus);
- near-dup cluster losers are bounded by clustered docs by construction;
- the benchmark gram set is eval-suite-sized;
each is ``ray.put`` once, and a single ``map_batches`` computes every
per-doc signal and the conjunction. The corpus itself never crosses an
exchange beyond the two aggregates the standalone dedup ops already do.
(At adversarial duplicate rates the {hash → keep} broadcast grows with the
dup population; the hash-partitioned join in store/merge.py is the drop-in
alternative — same trade documented at ops/dedup.py's minhash verify.)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data

from ..ops.corpus_stats import (
    G_MAX_MWL, G_MAX_WORDS, G_MIN_DISTINCT_RATIO, G_MIN_MWL, G_MIN_WORDS,
    gopher_metrics, gopher_rules,
)
from ..ops.dedup import duplicate_clusters, exact_dedup
from ..ops.text import DECON_MOD, DECON_N, WORD_RE, grams_of


def clean_corpus(sf_dir: str, neardup_threshold: float = 0.5) -> pd.DataFrame:
    """Per-document verdicts for the full cleaning pipeline (all docs, all
    stage flags — auditable, `WHERE kept` is the corpus that ships)."""
    # -- bounded broadcast 1: duplicated-hash keep map -------------------
    ed = exact_dedup(sf_dir)
    dup_map = {
        r.text_hash: int(r.keep_doc_id)
        for r in ed[ed["dup_count"] > 1].itertuples()
    }
    # -- bounded broadcast 2: near-dup losers ----------------------------
    cl = duplicate_clusters(sf_dir, neardup_threshold)
    nd_losers = set(
        int(d) for d, c in zip(cl["doc_id"], cl["cluster_id"]) if int(d) != int(c)
    )
    # -- bounded broadcast 3: benchmark gram set (distributed build) -----
    def bench_grams(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.loc[df["doc_id"] % DECON_MOD == 0, "text"].fillna("")
        out = set()
        for ts in sub.str.findall(WORD_RE):
            out |= grams_of(ts, DECON_N)
        # explicit object dtype: an empty batch would otherwise emit a
        # float64 'gram' column and produce a cross-block schema mismatch
        return pd.DataFrame({"gram": pd.Series(sorted(out), dtype="object")})

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    bench = set(
        docs.map_batches(bench_grams, batch_format="pandas").to_pandas()["gram"]
    )
    bref = ray.put((dup_map, nd_losers, bench))

    # -- the single verdict pass ----------------------------------------
    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        dmap, losers, bgrams = ray.get(bref)
        txt = df["text"].fillna("")
        toks_cs = txt.str.findall(WORD_RE)  # case-sensitive (grams, dedup)
        toks = txt.str.lower().str.findall(WORD_RE)  # lowercase (quality)
        n_words, mwl, dr = gopher_metrics(toks)
        rule_quality = gopher_rules(n_words, mwl, dr)
        hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in txt]
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        rule_exact = np.array(
            [h not in dmap or dmap[h] == i for h, i in zip(hashes, ids)]
        )
        rule_neardup = np.array([i not in losers for i in ids])
        is_bench = ids % DECON_MOD == 0
        overlap = np.array(
            [len(bgrams & grams_of(ts, DECON_N)) for ts in toks_cs],
            dtype=np.int64,
        )
        rule_decon = (~is_bench) & (overlap == 0)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "rule_quality": rule_quality,
                "rule_exact_keep": rule_exact,
                "rule_neardup_keep": rule_neardup,
                "rule_decontaminated": rule_decon,
                "kept": rule_quality & rule_exact & rule_neardup & rule_decon,
            }
        )

    return (
        docs.map_batches(verdict, batch_format="pandas")
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
