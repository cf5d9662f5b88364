"""Detail-page → listing-record extraction (the per-row invariant).

``extract_listing_row`` reproduces the reference's ``parse_house``
(funda_spider.py:188-453) and ``parse_listing`` (funda_spider_sold.py:188-402)
field-for-field; ``normalize_item`` reproduces the FundaPipeline type
coercions (pipelines.py:8-52). ``ExtractListings`` wraps them as an
actor-pool ``map_batches`` stage: selector machinery is compiled at import,
per-batch work is row-wise only where HTML parsing forces it.

Output columns (FundaItem, items.py:10-24) — dates kept as strings because
the reference emits them as strings (sold JSON-LD dates pass through
verbatim, funda_spider_sold.py:263-266):
url, street, neighborhood, property_type, city, postal_code, price:int64,
year_built:int32, living_area:int32, num_rooms:int32, status, listing_date,
selling_date, energy_label, scraped_at.
"""

from __future__ import annotations

import re
from typing import Any, Optional
from urllib.parse import urlsplit

import pyarrow as pa

from . import fields as F
from .selectolite import Selector

LISTING_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("street", pa.string()),
        ("neighborhood", pa.string()),
        ("property_type", pa.string()),
        ("city", pa.string()),
        ("postal_code", pa.string()),
        ("price", pa.int64()),
        ("year_built", pa.int32()),
        ("living_area", pa.int32()),
        ("num_rooms", pa.int32()),
        ("status", pa.string()),
        ("listing_date", pa.string()),
        ("selling_date", pa.string()),
        ("energy_label", pa.string()),
        ("scraped_at", pa.string()),
    ]
)

_FIELD_NAMES = [f.name for f in LISTING_SCHEMA]

_PIPE_ROOMS_RE = re.compile(r"(\d+)\s*(?:kamers?|rooms?)")  # pipelines.py:33


def place_from_url(url: str) -> str:
    """Deterministic place for standalone extraction: the path segment after
    /detail/koop/ (the reference passes place as a spider argument; the crawl
    pipeline threads it from the seed chain instead)."""
    parts = urlsplit(url).path.strip("/").split("/")
    try:
        i = parts.index("koop")
        if i >= 1 and parts[i - 1] == "detail" and len(parts) > i + 1:
            return parts[i + 1]
    except ValueError:
        pass
    return ""


def extract_listing_row(
    html: str,
    url: str,
    place: str,
    mode: str = "active",
    scraped_at: str = "",
    prior_status: Optional[str] = None,
    http_status: int = 200,
) -> Optional[dict]:
    """One detail page → FundaItem dict, or None when blocked (counted by the
    caller). ``mode`` selects the active vs sold spider semantics."""
    if F.is_blocked_detail(http_status, html):
        return None
    sel = Selector(html)
    scripts = sel.jsonld_scripts()

    item: dict[str, Any] = dict.fromkeys(_FIELD_NAMES)
    item["url"] = url
    item["scraped_at"] = scraped_at

    if mode == "sold":
        item["status"] = "sold"
        item["energy_label"] = F.extract_energy_label(sel, scripts)
        item.update(
            (k, v)
            for k, v in F.extract_sold_fields(sel, scripts, place).items()
        )
        item["year_built"] = F.extract_year_built_sold(sel)
        item["num_rooms"] = F.extract_rooms(sel, sold=True)
        if not item["living_area"]:  # JSON-LD floorSize first, HTML fallback
            item["living_area"] = F.extract_area_html(sel)
    else:
        # Reference sends status='active' even for republish candidates; the
        # store merge applies the republish transition (funda_spider.py:198-204).
        item["status"] = "active"
        item["energy_label"] = F.extract_energy_label(sel, scripts)
        item["street"] = F.extract_street_active(sel, scripts)
        item["property_type"] = F.extract_property_type(sel)
        json_ld = F.select_main_jsonld(scripts)
        nbh, city, postal = F.extract_locality_active(sel, json_ld, place)
        item["neighborhood"], item["city"], item["postal_code"] = nbh, city, postal
        item["price"] = F.extract_price_active(sel, json_ld)
        item["year_built"] = F.extract_year_built_active(sel)
        item["num_rooms"] = F.extract_rooms(sel, sold=False)
        item["living_area"] = F.extract_area_html(sel)
        item["listing_date"] = F.extract_listing_date_active(sel)

    return normalize_item(item)


def normalize_item(item: dict) -> dict:
    """M15 — FundaPipeline string→int coercions (pipelines.py:8-52)."""
    v = item.get("price")
    if v is not None and isinstance(v, str):
        try:
            item["price"] = int(float(v.replace("€", "").replace(".", "").replace(",", "").strip()))
        except ValueError:
            item["price"] = None
    elif isinstance(v, float):
        item["price"] = int(v)

    v = item.get("living_area")
    if v is not None and isinstance(v, str):
        try:
            item["living_area"] = int(float(v.replace("m²", "").strip()))
        except ValueError:
            item["living_area"] = None

    v = item.get("num_rooms")
    if v is not None and isinstance(v, str):
        m = _PIPE_ROOMS_RE.search(v)
        item["num_rooms"] = int(m.group(1)) if m else None

    v = item.get("year_built")
    if v is not None and isinstance(v, str):
        try:
            item["year_built"] = int(v.strip())
        except ValueError:
            item["year_built"] = None
    return item


def rows_to_table(rows: list[dict]) -> pa.Table:
    cols = {n: [r.get(n) for r in rows] for n in _FIELD_NAMES}
    return pa.Table.from_pydict(cols, schema=LISTING_SCHEMA)


class ExtractListings:
    """Actor-pool map_batches stage: Arrow batch of pages → Arrow listings.

    Input columns: url, html (binary or string); optional place, mode,
    prior_status columns override the derived defaults. Blocked rows are
    dropped (the crawl pipeline counts them via the lineage stage).
    """

    def __init__(self, mode: str = "active", scraped_at: str = "1970-01-01T00:00:00"):
        self.mode = mode
        self.scraped_at = scraped_at

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        places = (
            batch.column("place").to_pylist()
            if "place" in batch.column_names
            else [None] * len(urls)
        )
        modes = (
            batch.column("mode").to_pylist()
            if "mode" in batch.column_names
            else [self.mode] * len(urls)
        )
        rows = []
        for url, html, place, mode in zip(urls, htmls, places, modes):
            if isinstance(html, bytes):
                html = html.decode("utf-8", errors="replace")
            row = extract_listing_row(
                html,
                url,
                place if place is not None else place_from_url(url),
                mode=mode or "active",
                scraped_at=self.scraped_at,
            )
            if row is not None:
                rows.append(row)
        return rows_to_table(rows)
