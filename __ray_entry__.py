"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in fundamental_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: deterministic synthetic Common-Crawl-style pages
    corpus (BASELINE.json input_hint shape) → stateless listing extraction
    (the reference spiders' parse semantics) as an actor-pool map_batches.
    Returns the listings Dataset."""
    from fundamental_ray.pipelines.extract import extract_listings_dataset
    from fundamental_ray.synth.materialize import SCRAPED_AT, materialize_corpus

    corpus = materialize_corpus("sf0.001")
    return extract_listings_dataset(
        f"{corpus}/pages.parquet", mode="active", scraped_at=SCRAPED_AT
    )


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from fundamental_ray import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB SQL for EVERY queries() entry: testdata queries against ANSI
    SQL over the pre-registered views; crawl-family queries against the
    independent reference-simulator goldens (path-embedded parquet,
    materialized lazily); non-SQL-expressible kernels against
    local-reference-implementation artifacts with the operator semantics
    (LSH banding join, brute-force hamming/jaccard verification,
    aggregation) performed by DuckDB itself (fundamental_ray/oracle/)."""
    from fundamental_ray import registry

    return registry.oracle_sql()
