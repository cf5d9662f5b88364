"""Freshness-driven recrawl scheduling — the "which URLs do we fetch NEXT
crawl cycle" planner that sits on top of the frontier.

The reference refreshes every city on a fixed weekly slot grid
(scheduler.go:209-259) — a uniform-change-rate assumption. A web-scale
crawler schedules per-URL: each page gets an estimated change period and
is recrawled when its age/period staleness factor is highest (the
Cho & Garcia-Molina 2000 uniform/proportional refresh model). Here the
change-period class is a deterministic function of the url (md5 bucket →
{hourly, daily, weekly, monthly}), age is measured against the fixed
SCRAPED_AT clock (config time, never wall-clock), and the planner emits
the top-k most-overdue URLs per host — per host because fetch capacity is
a per-host politeness budget, so the recrawl quota is a per-host cut, not
a global one.

Scale shape: the same distributed per-group top-k as ops/webtext.py's
stratified sampler — each batch keeps ≤ k rows per host it sees
(combiner), one narrow exchange of ≤ k × hosts × blocks rows, final cut
in map_groups. html/text never leave the scan (columns pruned at the
read); staleness is vectorized numpy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from fundamental_ray.sources.parquet import read_parquet_clean
from fundamental_ray.synth.materialize import (
    SCRAPED_AT,
    materialize_corpus,
    scale_tag_of,
)

# md5(url) % 4 → assumed change period, hours
RECRAWL_PERIOD_HOURS = (1, 24, 168, 720)  # hourly / daily / weekly / monthly
RECRAWL_TOPK_PER_HOST = 5
_NOW_US = int(pd.Timestamp(SCRAPED_AT).value // 1_000)


def _freq_class(urls) -> np.ndarray:
    return np.array(
        [
            int(hashlib.md5(u.encode("utf-8")).hexdigest()[:8], 16)
            % len(RECRAWL_PERIOD_HOURS)
            for u in urls
        ],
        dtype=np.int64,
    )


def recrawl_schedule(sf_dir: str, k: int = RECRAWL_TOPK_PER_HOST) -> pd.DataFrame:
    """(host, rk, url, freq_class, staleness): the k most-overdue URLs per
    host — staleness = age/period at 6 dp (both sides divide the same
    integer microsecond quantities), rank ties broken by url asc."""
    corpus = materialize_corpus(scale_tag_of(sf_dir))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        urls = df["url"]
        cls = _freq_class(urls)
        age_us = _NOW_US - df["warc_ts"].astype("datetime64[us]").astype("int64").to_numpy()
        period_us = np.array(RECRAWL_PERIOD_HOURS, dtype=np.float64)[cls] * 3600e6
        out = pd.DataFrame(
            {
                "host": urls.str.split("://").str[1].str.split("/").str[0],
                "url": urls,
                "freq_class": cls,
                "staleness": np.round(age_us / period_us, 6),
            }
        )
        # per-batch combiner: ≤ k rows per host leave this batch
        return (
            out.sort_values(["staleness", "url"], ascending=[False, True])
            .groupby("host", sort=False)
            .head(k)
        )

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["staleness", "url"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g.insert(1, "rk", np.arange(1, len(g) + 1, dtype=np.int64))
        return g

    return (
        read_parquet_clean(f"{corpus}/pages.parquet", columns=["url", "warc_ts"])
        .map_batches(score, batch_format="pandas")
        .groupby("host")
        .map_groups(cut, batch_format="pandas")
        .to_pandas()
        .sort_values(["host", "rk"])
        .reset_index(drop=True)
        .astype({"rk": "int64", "freq_class": "int64"})
    )


def recrawl_schedule_sql(corpus: str) -> str:
    periods = " ".join(
        f"WHEN {i} THEN {h}" for i, h in enumerate(RECRAWL_PERIOD_HOURS)
    )
    return f"""
WITH p AS (
  SELECT url,
         split_part(split_part(url, '://', 2), '/', 1) AS host,
         (('0x' || substr(md5(url), 1, 8))::UBIGINT
            % {len(RECRAWL_PERIOD_HOURS)})::BIGINT AS freq_class,
         epoch_us(TIMESTAMP '{SCRAPED_AT.replace("T", " ")}')
           - epoch_us(warc_ts) AS age_us
  FROM read_parquet('{corpus}/pages.parquet')
), s AS (
  SELECT host, url, freq_class,
         ROUND(age_us::DOUBLE /
               ((CASE freq_class {periods} END) * 3600e6), 6) AS staleness
  FROM p
)
SELECT host, ROW_NUMBER() OVER (
         PARTITION BY host ORDER BY staleness DESC, url
       )::BIGINT AS rk, url, freq_class, staleness
FROM s
QUALIFY rk <= {RECRAWL_TOPK_PER_HOST}
ORDER BY host, rk
"""
