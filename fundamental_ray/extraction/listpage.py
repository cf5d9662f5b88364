"""Search/list-page extraction — candidate URLs + pagination (M1/M2).

Mirrors funda_spider.py:92-184 (and the sold twin 92-181, identical), plus
the looser refresh variant funda_spider.py:465-486.
"""

from __future__ import annotations

import json
from typing import Optional
from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

from .selectolite import Selector


def extract_listing_urls(
    sel: Selector, base_url: str, refresh: bool = False
) -> set[str]:
    """M1 — JSON-LD itemListElement ∪ HTML anchors, filtered by the
    '/detail/koop/' substring ('/koop/' in refresh mode), relative hrefs
    resolved against the page URL (funda_spider.py:92-116, 465-486)."""
    needle = "/koop/" if refresh else "/detail/koop/"
    out: set[str] = set()
    for script in sel.jsonld_scripts():  # per-script try/continue (:97-107)
        try:
            data = json.loads(script)
        except json.JSONDecodeError:
            continue
        if isinstance(data, dict) and "itemListElement" in data:
            for item in data["itemListElement"]:
                url = item.get("url")
                if url and needle in url:
                    out.add(url)
    anchors = sel.css_getall('div[data-test-id="search-result-item"] a::attr(href)')
    anchors.extend(sel.css_getall("div.search-result__header-title-col a::attr(href)"))
    for url in anchors:
        if needle in url:
            out.add(urljoin(base_url, url))
    return out


def extract_next_page(
    sel: Selector,
    base_url: str,
    base_params: dict[str, str],
    next_page_number: int,
) -> str:
    """M2 — next-page button href, else manual re-encode with page=N+1
    (funda_spider.py:158-184)."""
    href = sel.css_get('a[data-test-id="next-page-button"]::attr(href)')
    if href:
        return urljoin(base_url, href)
    params = dict(base_params)
    params["page"] = str(next_page_number)
    root = urlsplit(base_url)
    return urlunsplit((root.scheme, root.netloc, root.path, urlencode(params), ""))


def build_search_url(
    host: str, place: str, availability: str, page: Optional[int] = None
) -> str:
    """S1 — seed/search URL (funda_spider.py:50-58; sold uses
    availability='unavailable', funda_spider_sold.py:50-58)."""
    params = {
        "selected_area": json.dumps([place]),
        "availability": json.dumps([availability]),
        "object_type": json.dumps(["house", "apartment"]),
        "sort": "date_down",
    }
    if page is not None:
        params["page"] = str(page)
    return f"https://{host}/zoeken/koop/?{urlencode(params)}"


def search_params_of(url: str) -> dict[str, str]:
    return dict(parse_qsl(urlsplit(url).query))
