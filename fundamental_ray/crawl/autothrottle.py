"""Scrapy AutoThrottle delay adaptation re-expressed as a per-host ordered
fold — the latency-feedback half of the reference's politeness stack
(funda_spider.py:16-22 enables AUTOTHROTTLE with START_DELAY 2,
MAX_DELAY 30, TARGET_CONCURRENCY 2.0 on top of DOWNLOAD_DELAY 2; the
algorithm itself is Scrapy's public extensions/throttle.py):

    target_delay = latency / TARGET_CONCURRENCY
    new_delay    = (slot_delay + target_delay) / 2
    new_delay    = max(target_delay, new_delay)
    new_delay    = min(max(MIN_DELAY, new_delay), MAX_DELAY)
    keep old delay if response not OK and new_delay <= slot_delay

Scale shape: hosts are Scrapy's download slots and the parallel unit —
ONE groupby(host) exchange, then a bounded sequential fold per host
inside map_groups (the recurrence is inherently ordered; per-host volume
is politeness-bounded). Response latencies/statuses are synthesized from
doc_id with integer arithmetic so the oracle is a standalone recursive
CTE. Determinism: every value is a dyadic rational (ints halved), so the
float64 recurrence is bit-identical across engines; output rounded to
3 dp anyway.
"""

from __future__ import annotations
from fundamental_ray.sources.parquet import read_parquet_clean

import numpy as np
import pandas as pd
import ray.data

AT_START_DELAY_MS = 2000.0
AT_MIN_DELAY_MS = 2000.0  # DOWNLOAD_DELAY
AT_MAX_DELAY_MS = 30000.0
AT_TARGET_CONCURRENCY = 2.0
AT_HOSTS = 20
AT_SLOW_MS = 15000.0  # "slow host" step threshold for the counter


def synth_responses(sf_dir: str) -> ray.data.Dataset:
    """Deterministic per-doc response stream: host = doc_id % H, seq =
    doc_id // H, latency 0.5–60 s, every 7th response (mod pattern) 503."""

    def make(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "host": ids % AT_HOSTS,
                "seq": ids // AT_HOSTS,
                "latency_ms": 500 + (ids * 131) % 59500,
                "status": np.where(ids % 7 == 3, 503, 200),
            }
        ).astype("int64")

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(make, batch_format="pandas")


def _adjust(delay: float, latency_ms: float, status: int) -> float:
    """One Scrapy _adjust_delay step (extensions/throttle.py semantics)."""
    target = latency_ms / AT_TARGET_CONCURRENCY
    new = (delay + target) / 2.0
    new = max(target, new)
    new = min(max(AT_MIN_DELAY_MS, new), AT_MAX_DELAY_MS)
    if status != 200 and new <= delay:
        return delay
    return new


def autothrottle_delays(sf_dir: str) -> pd.DataFrame:
    """(host, n_responses, n_errors, final_delay_ms, n_slow_steps) after
    folding each host's response stream through the AutoThrottle
    recurrence from the start delay."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("seq")
        delay = AT_START_DELAY_MS
        n_slow = 0
        for lat, st in zip(g["latency_ms"].to_numpy(), g["status"].to_numpy()):
            delay = _adjust(delay, float(lat), int(st))
            if delay >= AT_SLOW_MS:
                n_slow += 1
        return pd.DataFrame(
            {
                "host": [int(g["host"].iloc[0])],
                "n_responses": [len(g)],
                "n_errors": [int((g["status"] != 200).sum())],
                "final_delay_ms": [round(delay, 3)],
                "n_slow_steps": [n_slow],
            }
        )

    return (
        synth_responses(sf_dir)
        .groupby("host")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .astype(
            {"host": "int64", "n_responses": "int64", "n_errors": "int64",
             "n_slow_steps": "int64"}
        )
        .sort_values("host")
        .reset_index(drop=True)
    )


AUTOTHROTTLE_SQL = f"""
WITH RECURSIVE resp AS (
  -- dense per-host seq (ROW_NUMBER, not doc_id // H): the recursion
  -- advances seq+1, so a doc_id gap must not break the chain
  SELECT doc_id % {AT_HOSTS} AS host,
         ROW_NUMBER() OVER (PARTITION BY doc_id % {AT_HOSTS} ORDER BY doc_id)
           - 1 AS seq,
         (500 + (doc_id * 131) % 59500)::DOUBLE AS latency_ms,
         CASE WHEN doc_id % 7 = 3 THEN 503 ELSE 200 END AS status
  FROM documents
),
rec(host, seq, delay, hits) AS (
  SELECT host, -1::BIGINT, {AT_START_DELAY_MS}::DOUBLE, 0::BIGINT
  FROM (SELECT DISTINCT host FROM resp)
  UNION ALL
  SELECT rec.host, r.seq,
         CASE WHEN r.status <> 200 AND
                   LEAST(GREATEST({AT_MIN_DELAY_MS},
                         GREATEST(r.latency_ms / {AT_TARGET_CONCURRENCY},
                                  (rec.delay + r.latency_ms / {AT_TARGET_CONCURRENCY}) / 2.0)),
                         {AT_MAX_DELAY_MS}) <= rec.delay
              THEN rec.delay
              ELSE LEAST(GREATEST({AT_MIN_DELAY_MS},
                         GREATEST(r.latency_ms / {AT_TARGET_CONCURRENCY},
                                  (rec.delay + r.latency_ms / {AT_TARGET_CONCURRENCY}) / 2.0)),
                         {AT_MAX_DELAY_MS})
         END,
         rec.hits + CASE WHEN
           CASE WHEN r.status <> 200 AND
                     LEAST(GREATEST({AT_MIN_DELAY_MS},
                           GREATEST(r.latency_ms / {AT_TARGET_CONCURRENCY},
                                    (rec.delay + r.latency_ms / {AT_TARGET_CONCURRENCY}) / 2.0)),
                           {AT_MAX_DELAY_MS}) <= rec.delay
                THEN rec.delay
                ELSE LEAST(GREATEST({AT_MIN_DELAY_MS},
                           GREATEST(r.latency_ms / {AT_TARGET_CONCURRENCY},
                                    (rec.delay + r.latency_ms / {AT_TARGET_CONCURRENCY}) / 2.0)),
                           {AT_MAX_DELAY_MS})
           END >= {AT_SLOW_MS} THEN 1 ELSE 0 END
  FROM rec JOIN resp r ON r.host = rec.host AND r.seq = rec.seq + 1
),
fin AS (
  SELECT host, delay, hits,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY seq DESC) AS rn
  FROM rec
),
agg AS (
  SELECT host, COUNT(*)::BIGINT AS n_responses,
         SUM(CASE WHEN status <> 200 THEN 1 ELSE 0 END)::BIGINT AS n_errors
  FROM resp GROUP BY host
)
SELECT a.host, a.n_responses, a.n_errors,
       ROUND(f.delay, 3) AS final_delay_ms, f.hits AS n_slow_steps
FROM agg a JOIN fin f ON f.host = a.host AND f.rn = 1
ORDER BY a.host
"""
