"""Weekly refresh pass: URL collection without detail fetches (J4 feed).

Mirrors FundaSpider.collect_active_urls (funda_spider.py:455-503): paginate
each active chain following ONLY the next-page button (no manual page
construction in the refresh path), extract listing URLs with the looser
'/koop/' predicate (funda_spider.py:474,484), union them per chain. The
result feeds the store's mark-inactive anti-join (store/merge.py,
database.go:1252-1323), scheduled weekly in the reference
(scheduler.go:209-282).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..extraction.listpage import extract_listing_urls, extract_next_page
from ..extraction.selectolite import Selector
from .canonicalize import canonicalize_url
from .fetchstore import fetch_map_tasks


def _collect_batch(batch: pa.Table, meta_ref) -> pa.Table:
    meta = ray.get(meta_ref)  # url_norm -> chain_id
    out = {"chain_id": [], "kind": [], "url": []}
    for norm, url, html in zip(
        batch.column("url_norm").to_pylist(),
        batch.column("url").to_pylist(),
        batch.column("html").to_pylist(),
    ):
        cid = meta[norm]
        sel = Selector(html.decode("utf-8", errors="replace"))
        for u in sorted(extract_listing_urls(sel, url, refresh=True)):
            out["chain_id"].append(cid)
            out["kind"].append("url")
            out["url"].append(u)
        nxt = sel.css_get('a[data-test-id="next-page-button"]::attr(href)')
        if nxt:
            out["chain_id"].append(cid)
            out["kind"].append("next")
            out["url"].append(extract_next_page(sel, url, {}, 0))
    return pa.table(
        {
            "chain_id": pa.array(out["chain_id"], pa.int64()),
            "kind": pa.array(out["kind"], pa.string()),
            "url": pa.array(out["url"], pa.string()),
        }
    )


def refresh_collect(
    index_dir: str, chains, max_pages: int | None = None
) -> dict[int, set[str]]:
    """Returns chain_id → set of active URLs currently listed."""
    next_url = {c.chain_id: c.next_url for c in chains}
    page_no = dict.fromkeys(next_url, 1)
    collected: dict[int, set[str]] = {cid: set() for cid in next_url}
    while next_url:
        meta = {canonicalize_url(u): cid for cid, u in next_url.items()}
        refs = fetch_map_tasks(index_dir, list(meta), "list", _collect_batch,
                               {"meta_ref": ray.put(meta)})
        tables = [t for t in ray.get(refs) if t is not None and t.num_rows]
        nxt: dict[int, str] = {}
        for t in tables:
            for cid, kind, url in zip(
                t.column("chain_id").to_pylist(),
                t.column("kind").to_pylist(),
                t.column("url").to_pylist(),
            ):
                if kind == "url":
                    collected[cid].add(url)
                else:
                    nxt[cid] = url
        next_url = {}
        for cid, u in nxt.items():
            page_no[cid] += 1
            if max_pages is None or page_no[cid] <= max_pages:
                next_url[cid] = u
    return collected
