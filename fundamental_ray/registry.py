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
    register("agg_monthly_timeseries", A.monthly_timeseries, A.MONTHLY_TIMESERIES_SQL)
    register("agg_rooms_impact", A.rooms_impact, A.ROOMS_IMPACT_SQL)
    register("agg_ols_regression", A.ols_regression, A.OLS_REGRESSION_SQL)
    register("agg_minmax_profile", A.minmax_profile, A.MINMAX_PROFILE_SQL)
    register("agg_distinct_pairs", A.distinct_pairs, A.DISTINCT_PAIRS_SQL)
    register("window_prev_order", A.window_prev_order, A.WINDOW_PREV_ORDER_SQL)
    register("merge_latest_wins", A.latest_wins_merge, A.LATEST_WINS_MERGE_SQL)
    register("events_sessionize", A.events_sessionize, A.EVENTS_SESSIONIZE_SQL)
    register("events_tumbling_window", A.events_tumbling_window, A.EVENTS_TUMBLING_SQL)
    register("scalar_string_funcs", A.scalar_string_funcs, A.SCALAR_STRING_SQL)
    register("scalar_date_funcs", A.scalar_date_funcs, A.SCALAR_DATE_SQL)
    register("agg_heatmap_stats", A.heatmap_stats, A.HEATMAP_STATS_SQL)

    # crawl family — synthetic pages input, rows-only driver check
    register("crawl_extract_listings_active", _crawl_extract("active"))
    register("crawl_extract_listings_sold", _crawl_extract("sold"))

    from .ops import ann as N
    from .ops import dedup as D
    from .ops import multimodal as M
    from .ops import text as T

    register("text_token_counts", T.token_counts, T.TOKEN_COUNTS_SQL)
    register("text_quality_scores", T.quality_scores, T.QUALITY_SCORES_SQL)
    register("text_lang_id", T.lang_id, T.LANG_ID_SQL)
    register("text_fingerprints", T.fingerprints, T.FINGERPRINTS_SQL)
    register("dedup_exact", D.exact_dedup, D.EXACT_DEDUP_SQL)
    register(
        "dedup_embedding_neardup",
        lambda sf: D.embedding_neardup_pairs(sf, 0.35),
        D.embedding_neardup_sql(0.35),
    )
    register("dedup_minhash_lsh", lambda sf: D.minhash_lsh_pairs(sf, 0.5))
    register("dedup_simhash", lambda sf: D.simhash_pairs(sf, 6))
    register("dedup_ngram_jaccard", lambda sf: D.ngram_jaccard_pairs(sf, 0.5))
    register("ann_brute_force_topk", N.brute_force_topk, N.brute_force_topk_sql())
    register("ann_ivf_topk", N.ivf_topk)
    register("multimodal_media_features", M.media_features)

    from .pipelines import crawl_run as C

    register("crawl_frontier_page_visits", C.crawl_page_visits)
    register("crawl_frontier_seen_set", C.crawl_seen_set)
    register("crawl_frontier_counters", C.crawl_counters)
    register("crawl_frontier_listings", C.crawl_listings)
    register("crawl_store_properties", C.crawl_store_properties)
    register("crawl_refresh_inactive", C.crawl_refresh_inactive)
    register("crawl_district_hulls", C.crawl_district_hulls)
    register("crawl_price_ratings", C.crawl_price_ratings)
    register("crawl_notify_filtered", C.crawl_notify_filtered)
    register("crawl_metro_centers", C.crawl_metro_centers)
    register("crawl_property_stats", C.crawl_property_stats)
    register("crawl_district_median_psqm", C.crawl_district_median_psqm)
    register("crawl_district_price_stats", C.crawl_district_price_stats)
