"""WARC revisit records: payload-digest capture dedup over the page table.

A WARC-writing crawler (Heritrix, and Common Crawl's own pipeline) does
not store a page's bytes twice: every capture carries a payload digest,
and a capture whose digest was already stored is written as a ``revisit``
record pointing at the original ``response`` record (WARC 1.1 §6.7.2,
"identical payload digest" profile). That one step is what keeps a
recrawl-heavy archive from growing with fetch count instead of content
count. The reference never refetches within a run (its URL-seen set is
per-run, funda_spider.py:118-120); at the 10^10-URL frontier of
BASELINE.json, captures of identical bytes under different URLs (mirrors,
session-id aliases, parked hosts serving one blank page) are routine and
this is the operator that collapses them at the STORAGE layer, upstream
of any text-level dedup in ops/dedup.py.

Deterministic definition (mirrored exactly by the SQL oracle):
  * digest = md5(raw page bytes);
  * per digest, the canonical capture is the earliest by
    ``(warc_ts, url)`` — that capture is the ``response`` record;
  * every other capture of the digest is a ``revisit`` record whose
    ``refers_to_url`` / ``refers_to_ts`` name the canonical capture
    (NULL on response records, as in WARC's WARC-Refers-To-* headers).

Scale shape: digests are computed in-batch from a pruned (url, warc_ts,
html) read, and only the NARROW (url, warc_ts, digest) rows — 16-byte
digest, never the page bytes — cross the single digest-keyed exchange;
each group folds locally. Per-group cost is O(captures of that digest);
a pathological hot digest (one blank page served by every URL of a dead
host) makes one large group — at that point only the group's argmin is
actually needed, so the skew-proof variant is a partial-min combiner +
hash join-back (the ops/joins.py join_hash_segments idiom) at the cost
of a second exchange. At web dup rates groups are tiny and the single
exchange wins.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from fundamental_ray.sources.parquet import read_parquet_clean
from fundamental_ray.synth.materialize import materialize_corpus, scale_tag_of


def revisit_records(sf_dir: str) -> pd.DataFrame:
    """One row per capture: (url, warc_ts, digest, record_type,
    refers_to_url, refers_to_ts), response-or-revisit per WARC 1.1."""
    corpus = materialize_corpus(scale_tag_of(sf_dir))

    def digests(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "url": df["url"],
                "warc_ts": df["warc_ts"],
                "digest": [
                    hashlib.md5(
                        h if isinstance(h, (bytes, bytearray)) else str(h).encode()
                    ).hexdigest()
                    for h in df["html"]
                ],
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["warc_ts", "url"], kind="mergesort").reset_index(drop=True)
        is_first = np.arange(len(g)) == 0
        g["record_type"] = np.where(is_first, "response", "revisit")
        g["refers_to_url"] = pd.Series(g["url"].iat[0], index=g.index).where(
            ~is_first, None
        )
        g["refers_to_ts"] = pd.Series(g["warc_ts"].iat[0], index=g.index).where(
            ~is_first, pd.NaT
        )
        return g

    return (
        read_parquet_clean(
            f"{corpus}/pages.parquet", columns=["url", "warc_ts", "html"]
        )
        .map_batches(digests, batch_format="pandas")
        .groupby("digest")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def revisit_records_sql(corpus: str) -> str:
    return f"""
WITH d AS (
  SELECT url, warc_ts, md5(decode(html)) AS digest
  FROM read_parquet('{corpus}/pages.parquet')
), r AS (
  SELECT url, warc_ts, digest,
         row_number()      OVER w AS rn,
         first_value(url)  OVER w AS first_url,
         first_value(warc_ts) OVER w AS first_ts
  FROM d
  WINDOW w AS (PARTITION BY digest ORDER BY warc_ts, url)
)
SELECT url, warc_ts, digest,
       CASE WHEN rn = 1 THEN 'response' ELSE 'revisit' END AS record_type,
       CASE WHEN rn = 1 THEN NULL ELSE first_url END AS refers_to_url,
       CASE WHEN rn = 1 THEN NULL ELSE first_ts END AS refers_to_ts
FROM r ORDER BY url
"""
