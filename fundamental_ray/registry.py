"""Query + oracle registry backing __ray_entry__.queries()/oracle_sql().

Keys are stable operator names tied to SURVEY.md §2 rows. Oracle SQL runs in
DuckDB over the pre-registered testdata views; crawl-family queries run over
the deterministic synthetic pages corpus (derived from sf_dir) and therefore
get rows-only checks from the driver — their strong oracles live in
tests/ (goldens + DuckDB over the same synthetic tables).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_QUERIES: dict[str, Callable[[str], Any]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable[[str], Any], sql: str | None = None) -> None:
    _QUERIES[name] = fn
    if sql is not None:
        _ORACLES[name] = sql


def queries() -> dict[str, Callable[[str], Any]]:
    _populate()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _populate()
    return dict(_ORACLES)


_POPULATED = False


def _crawl_extract(mode: str):
    def run(sf_dir: str):
        from .pipelines.extract import extract_listings_dataset
        from .synth.materialize import SCRAPED_AT, materialize_corpus, scale_tag_of

        corpus = materialize_corpus(scale_tag_of(sf_dir))
        return extract_listings_dataset(
            f"{corpus}/pages.parquet", mode=mode, scraped_at=SCRAPED_AT
        )

    return run


def _populate() -> None:
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True

    from .pipelines import analytics as A

    register("agg_weighted_status_stats", A.weighted_status_stats, A.WEIGHTED_STATUS_STATS_SQL)
    register("agg_district_stats", A.district_stats, A.DISTRICT_STATS_SQL)
    register("agg_exact_median", A.exact_median, A.EXACT_MEDIAN_SQL)
    register("sort_recent_topk", A.recent_topk, A.RECENT_TOPK_SQL)
    register("join_anti_customers", A.anti_join_customers, A.ANTI_JOIN_CUSTOMERS_SQL)
    register("join_broadcast_enrich", A.broadcast_join_enrich, A.BROADCAST_JOIN_ENRICH_SQL)

    # crawl family — synthetic pages input, rows-only driver check
    register("crawl_extract_listings_active", _crawl_extract("active"))
    register("crawl_extract_listings_sold", _crawl_extract("sold"))

    from .pipelines import crawl_run as C

    register("crawl_frontier_page_visits", C.crawl_page_visits)
    register("crawl_frontier_seen_set", C.crawl_seen_set)
    register("crawl_frontier_counters", C.crawl_counters)
    register("crawl_frontier_listings", C.crawl_listings)
