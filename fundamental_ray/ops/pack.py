"""Sequence packing — assign every document to a fixed-token-budget training
sequence by GLOBAL (per-lang, doc_id-ordered) prefix sums of token counts:
the distributed scan every pre-training tokenization/packing job runs
(GPT-style "concatenate the stream, cut every N tokens" packing, expressed
so a doc's sequence id and intra-sequence offset are pure functions of the
exclusive prefix sum).

Scale shape (the classic two-pass parallel scan):
1. ONE streaming pass over the corpus text computes the narrow projection
   (doc_id, lang, n_tok, bucket) — the text column is read exactly once;
   the projection is ~20 bytes/row and is materialized so pass 2 does not
   re-tokenize (at 10^10 docs it is ~0.2 TB spread across the cluster's
   object store, spillable, vs re-reading ~100 TB of text).
2. Per-(bucket, lang) token-sum partials cross ONE map-side-combined
   groupby; the driver turns this O(buckets × langs) table into exclusive
   per-lang base offsets (bucket order = doc_id order because bucket =
   doc_id // span) and broadcasts the tiny dict once via ray.put.
3. A per-bucket ordered fold (sort each bucket locally by doc_id, local
   exclusive cumsum + broadcast base) emits seq_id = prefix // budget and
   seq_offset = prefix % budget — all integer arithmetic, hash-exact.

No global sort is ever performed: ordering comes from the bucket
decomposition of the doc_id key space, so the only exchanges are the
constant-width partials groupby and the bucket groupby of the narrow
projection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data.aggregate import Sum

from .text import WORD_RE, _read_docs

PACK_SEQ_TOKENS = 256
PACK_BUCKET_SPAN = 64


def pack_sequences(
    sf_dir: str,
    seq_tokens: int = PACK_SEQ_TOKENS,
    bucket_span: int = PACK_BUCKET_SPAN,
) -> pd.DataFrame:
    """(doc_id, lang, n_tok, seq_id, seq_offset): the packing assignment.

    seq_id is lang-local (each lang is its own packed stream, the
    data-mixing norm); a doc that straddles a boundary starts at
    seq_offset in seq_id and spills into seq_id+1 — the downstream
    tokenizer's concern, not the planner's.
    """

    def tok(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].fillna("").str.count(WORD_RE.pattern).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "lang": df["lang"],
                "n_tok": n,
                "bucket": (df["doc_id"] // bucket_span).astype("int64"),
            }
        )

    toks = (
        _read_docs(sf_dir, columns=["doc_id", "text", "lang"])
        .map_batches(tok, batch_format="pandas")
        .materialize()  # narrow projection; see module docstring
    )

    parts = (
        toks.groupby(["bucket", "lang"])
        .aggregate(Sum("n_tok", alias_name="s"))
        .to_pandas()
        .sort_values(["lang", "bucket"])
    )
    # exclusive per-lang prefix over buckets (bucket order == doc_id order)
    parts["base"] = parts.groupby("lang")["s"].cumsum() - parts["s"]
    base_ref = ray.put(
        {(int(b), l): int(v) for b, l, v in zip(parts["bucket"], parts["lang"], parts["base"])}
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(base_ref)
        g = g.sort_values("doc_id", kind="mergesort")
        local = g.groupby("lang", sort=False)["n_tok"].cumsum() - g["n_tok"]
        bucket = int(g["bucket"].iloc[0])
        prefix = local.to_numpy() + np.array(
            [base[(bucket, l)] for l in g["lang"]], dtype=np.int64
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "lang": g["lang"].to_numpy(),
                "n_tok": g["n_tok"].to_numpy(),
                "seq_id": prefix // seq_tokens,
                "seq_offset": prefix % seq_tokens,
            }
        )

    return (
        toks.groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


PACK_SEQUENCES_SQL = rf"""
WITH t AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(COALESCE(text, ''), '\S+'))::BIGINT AS n_tok
  FROM documents
), p AS (
  SELECT doc_id, lang, n_tok,
         COALESCE(SUM(n_tok) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS prefix
  FROM t
)
SELECT doc_id, lang, n_tok,
       (prefix // {PACK_SEQ_TOKENS})::BIGINT AS seq_id,
       (prefix % {PACK_SEQ_TOKENS})::BIGINT AS seq_offset
FROM p
"""
