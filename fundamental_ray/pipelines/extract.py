"""Minimum end-to-end slice (SURVEY.md §7.1): pages → listings.

read_parquet(columns pruned) → actor-pool map_batches(ExtractListings,
batch_format='pyarrow') → listings Dataset. Zero shuffles; html bytes never
cross an exchange (SURVEY.md §7.5.6).
"""

from __future__ import annotations
from fundamental_ray.sources.parquet import read_parquet_clean

import ray
import ray.data

from ..extraction.listing import ExtractListings


def _extract_batch(batch, mode: str, scraped_at: str):
    return ExtractListings(mode=mode, scraped_at=scraped_at)(batch)


def extract_listings_dataset(
    pages_path: str,
    mode: str = "active",
    scraped_at: str = "1970-01-01T00:00:00",
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Stateless per-row extraction over detail pages.

    Detail pages are selected by the reference's own URL predicate
    ('/detail/koop/', funda_spider.py:104) pushed into the parquet scan, so
    list pages and noise rows never leave storage. batch_size is small
    because rows are HTML-sized (~2-8 KB) and per-row parse cost dominates;
    actor pool amortizes selector-engine setup.
    """
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    ds = read_parquet_clean(
        pages_path,
        columns=["url", "html"],
        filter=pc.match_substring(pads.field("url"), "/detail/koop/"),
    )
    if concurrency is not None:
        # explicit actor-pool path (stateful-stage showcase); cap below the
        # session CPUs — a pool reserving every CPU starves the read stage
        # and the pipeline stalls (observed at 32 CPUs with ncpu-2 actors)
        return ds.map_batches(
            ExtractListings,
            fn_constructor_kwargs={"mode": mode, "scraped_at": scraped_at},
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=1,
            concurrency=concurrency,
        )
    # default: stateless tasks — extraction holds no per-actor state (the
    # selector compile cache is worker-process-global), and tasks scale
    # elastically to every CPU with no pool spin-up (SURVEY.md §4.2)
    return ds.map_batches(
        _extract_batch,
        fn_kwargs={"mode": mode, "scraped_at": scraped_at},
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
    )
