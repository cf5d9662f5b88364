"""Listing-field extractors — the byte-identical parse contract.

Each function mirrors one extraction operator of the reference spiders
(reference: server/scripts/scrapers/funda/spiders/funda_spider.py and
funda_spider_sold.py), preserving fallback tier order, regexes, and even
exception-scoping quirks (e.g. a malformed JSON-LD script aborts the whole
JSON-LD tier where the reference wraps the loop in one try block, but is
skipped per-script where the reference catches inside the loop).

All functions are pure: (Selector, ...) -> Optional[value]. They are invoked
row-wise inside an actor-pool ``map_batches`` stage (see listing.py) — the
per-row Python cost is inherent to HTML parsing; batching amortizes selector
compilation and actor setup.
"""

from __future__ import annotations

import json
import re
from typing import Any, Optional

from .selectolite import Selector

# --- compiled regexes (module import time = once per worker process) -------
ENERGY_VALID_RE = re.compile(r"^[A-G](\+{1,2})?$")
ENERGY_JSONLD_RE = re.compile(
    r"[\"']energy(?:Label|Data)[\"']\s*:\s*[\"']([A-G]\+*)[\"']", re.IGNORECASE
)
ENERGY_DESC_RE = re.compile(r"energi(?:elabel|eklasse)\s*([a-g](?:\+{1,2})?)")
STREET_SPLIT_RE = re.compile(r"^(.*?)\s*(\d+(?:\s*[a-zA-Z-]?\d*)?)\s*$")
POSTAL_TITLE_RE = re.compile(r"\b\d{4}\s?[A-Z]{2}\b")
PRICE_RE = re.compile(r"€\s*([\d.,]+)")
AREA_RE = re.compile(r"(\d+)\s*(?:m²|m2)")
ROOMS_ACTIVE_RE = re.compile(r"(\d+)\s+kamers?")   # funda_spider.py:389  (\d+)\s+
ROOMS_SOLD_RE = re.compile(r"(\d+)\s*kamers?")     # funda_spider_sold.py:366  (\d+)\s*
YEAR_SOLD_RE = re.compile(r"(\d{4})")
DUTCH_DATE_RE = re.compile(r"(\d{1,2})\s+(\d{2})\s+(\d{4})")
SOLD_ADDR_RE = re.compile(r"(\d{4}\s?[A-Z]{2})\s+(.+)")

DUTCH_MONTHS = {
    "januari": "01", "februari": "02", "maart": "03", "april": "04",
    "mei": "05", "juni": "06", "juli": "07", "augustus": "08",
    "september": "09", "oktober": "10", "november": "11", "december": "12",
}

ENERGY_SELECTORS = [
    'dt:contains("Energielabel") + dd span::text',
    'dt:contains("Energielabel") + dd div span::text',
    'dt:contains("Energielabel") + dd::text',
    'span[data-test-id="energy-label"]::text',
    'span[class*="energy-label"]::text',
]

ADDRESS_SELECTORS = [
    "h1.object-header__title::text",
    "h1.object-header__container span.object-header__title::text",
    "h1.object-header__container span.object-header__street::text",
    "h1.object-header__container span.object-header__house-number::text",
    "div.object-header__details h1 span::text",
    "div.object-header__details-info h1.fd-m-none::text",
]

PRICE_SELECTORS = [
    'dt:contains("Vraagprijs") + dd span::text',
    'dt:contains("Prijs") + dd span::text',
    'div[class*="price"] span::text',
    'span[class*="price"]::text',
]

AREA_SELECTORS = [
    'dt:contains("Woonoppervlakte") + dd::text',
    'dt:contains("Gebruiksoppervlakte wonen") + dd::text',
    'li:contains("Woonoppervlakte") span.fd-text--emphasis::text',
    'li:contains("Gebruiksoppervlakte") span.fd-text--emphasis::text',
    'span:contains("m²")::text',
]

SOLD_DATE_SELECTORS = [
    'dt:contains("Aangeboden sinds") + dd::text',
    'dt:contains("Verkoopdatum") + dd::text',
    'li:contains("Aangeboden sinds") span.fd-text--emphasis::text',
    'li:contains("Verkoopdatum") span.fd-text--emphasis::text',
    'span[data-testid="listing-date"]::text',
    'span[data-testid="sale-date"]::text',
]


def is_blocked_detail(status: int, text: str) -> bool:
    """funda_spider.py:190 — status 403 or verification interstitial body."""
    return status == 403 or "Je bent bijna op de pagina die je zoekt" in text


def is_blocked_list(status: int) -> bool:
    """funda_spider.py:88 — list pages blocked on 403/302/503."""
    return status in (403, 302, 503)


def extract_energy_label(sel: Selector, scripts: list[str]) -> Optional[str]:
    """M4 — funda_spider.py:206-257 (identical in sold 198-249)."""
    # tier 1: HTML selectors, validated
    for s in ENERGY_SELECTORS:
        v = sel.css_get(s)
        if v:
            clean = v.strip().upper()
            if ENERGY_VALID_RE.match(clean):
                return clean
    # tier 2: JSON-LD — one try wraps the loop: malformed script aborts tier
    try:
        for script in scripts:
            data = json.loads(script)
            if isinstance(data, dict):
                if "EnergyData" in str(data) or "energyLabel" in str(data):
                    m = ENERGY_JSONLD_RE.search(script)
                    if m:
                        return m.group(1).upper()
    except (json.JSONDecodeError, AttributeError):
        pass
    # tier 3: description text
    for text in sel.css_getall(
        "div.object-description__features li::text, div.object-description-body *::text"
    ):
        t = text.strip().lower()
        if "energielabel" in t or "energieklasse" in t:
            m = ENERGY_DESC_RE.search(t)
            if m:
                return m.group(1).upper()
    return None


def extract_street_active(sel: Selector, scripts: list[str]) -> Optional[str]:
    """M5 — funda_spider.py:259-306."""
    street = sel.css_get("h1.object-header__container span.object-header__street::text")
    number = sel.css_get("h1.object-header__container span.object-header__house-number::text")
    if street and number:
        return f"{street.strip()} {number.strip()}"
    for s in ADDRESS_SELECTORS:
        addr = sel.css_get(s)
        if addr:
            addr = addr.strip()
            m = STREET_SPLIT_RE.match(addr)
            if m:
                name, num = m.groups()
                return f"{name.strip()} {num.strip()}"
    # JSON-LD fallback — try wraps loop (funda_spider.py:295-306)
    try:
        for script in scripts:
            data = json.loads(script)
            if isinstance(data, dict) and "address" in data:
                sa = data["address"].get("streetAddress")
                if sa:
                    return sa.strip()
    except (json.JSONDecodeError, KeyError, AttributeError):
        pass
    return None


def extract_property_type(sel: Selector) -> Optional[str]:
    """M6 — funda_spider.py:308-318."""
    for s in (
        'nav[aria-label="Breadcrumb"] span:contains("appartement")::text',
        'nav[aria-label="Breadcrumb"] span:contains("huis")::text',
    ):
        v = sel.css_get(s)
        if v:
            return v.strip().lower()
    return None


def select_main_jsonld(scripts: list[str]) -> Optional[dict]:
    """M7 — funda_spider.py:320-330; try wraps loop: first malformed script
    (before a matching one) kills the whole JSON-LD path."""
    try:
        for script in scripts:
            data = json.loads(script)
            if isinstance(data, dict) and data.get("@type") in (
                "Product", "Place", "RealEstateListing", "Appartement",
            ):
                return data
    except json.JSONDecodeError:
        pass
    return None


def extract_locality_active(
    sel: Selector, json_ld: Optional[dict], place: str
) -> tuple[Optional[str], Optional[str], Optional[str]]:
    """M8 — funda_spider.py:332-349 → (neighborhood, city, postal_code).

    city comes from the seed ``place`` argument, never page content
    (funda_spider.py:336). Empty strings propagate as in the reference
    (dict.get defaults are '' not None)."""
    if json_ld and "address" in json_ld:
        a = json_ld["address"]
        neighborhood = a.get("addressLocality", "").split(",")[0].strip()
        return neighborhood, place.capitalize(), a.get("postalCode", "")
    crumbs = sel.css_getall('nav[aria-label="Breadcrumb"] span::text')
    if crumbs:
        neighborhood = crumbs[-1].strip()
        postal = None
        title = sel.css_get("title::text")
        if title:
            m = POSTAL_TITLE_RE.search(title)
            if m:
                postal = m.group(0)
        return neighborhood, place.capitalize(), postal
    return None, None, None


def extract_price_active(sel: Selector, json_ld: Optional[dict]) -> Optional[Any]:
    """M9 — funda_spider.py:351-374. JSON-LD value returned verbatim (the
    type-normalization pipeline coerces strings later, pipelines.py:11-18)."""
    if json_ld and "offers" in json_ld and "price" in json_ld["offers"]:
        return json_ld["offers"]["price"]
    for s in PRICE_SELECTORS:
        v = sel.css_get(s)
        if v:
            m = PRICE_RE.search(v.replace(".", ""))
            if m:
                try:
                    return int(float(m.group(1).replace(",", "")))
                except ValueError:
                    continue
    return None


def extract_year_built_active(sel: Selector) -> Optional[int]:
    """M10 — funda_spider.py:376-382."""
    v = sel.css_get('dt:contains("Bouwjaar") + dd::text')
    if v:
        try:
            return int(v.strip())
        except ValueError:
            return None
    return None


def extract_year_built_sold(sel: Selector) -> Optional[int]:
    """M10 sold variant — funda_spider_sold.py:351-360 (first 4-digit run)."""
    v = sel.css_get('dt:contains("Bouwjaar") + dd::text')
    if v:
        m = YEAR_SOLD_RE.search(v)
        if m:
            return int(m.group(1))
    return None


def extract_rooms(sel: Selector, sold: bool) -> Optional[int]:
    """M11 — funda_spider.py:384-393 / funda_spider_sold.py:362-370.
    Active requires ≥1 whitespace before 'kamers', sold allows none."""
    v = sel.css_get('dt:contains("Aantal kamers") + dd::text')
    if v:
        m = (ROOMS_SOLD_RE if sold else ROOMS_ACTIVE_RE).search(v)
        if m:
            return int(m.group(1))
    return None


def extract_area_html(sel: Selector) -> Optional[int]:
    """M12 HTML tiers — funda_spider.py:395-417."""
    for s in AREA_SELECTORS:
        v = sel.css_get(s)
        if v:
            m = AREA_RE.search(v.strip())
            if m:
                return int(m.group(1))
    return None


def normalize_dutch_date(date_text: str) -> Optional[str]:
    """M13 — funda_spider.py:419-441: Dutch month → number, then
    d MM yyyy → 'YYYY-MM-DD' (day zero-padded)."""
    t = date_text.lower().strip()
    for dutch, num in DUTCH_MONTHS.items():
        t = t.replace(dutch, num)
    m = DUTCH_DATE_RE.search(t)
    if m:
        day, month, year = m.groups()
        return f"{year}-{month}-{int(day):02d}"
    return None


def extract_listing_date_active(sel: Selector) -> Optional[str]:
    v = sel.css_get('dt:contains("Aangeboden sinds") + dd::text')
    if v:
        return normalize_dutch_date(v)
    return None


# --- sold-spider composite extraction (funda_spider_sold.py:188-402) -------

def extract_sold_fields(sel: Selector, scripts: list[str], place: str) -> dict:
    """JSON-LD pass of the sold spider: dates, address, price, floor size.

    Mirrors funda_spider_sold.py:252-331: per-script try (malformed scripts
    are skipped, not tier-aborting), later scripts OVERWRITE earlier values
    (no break), dates_found gates the HTML date fallback.
    """
    out: dict = {
        "street": None, "city": None, "postal_code": None, "price": None,
        "living_area": None, "listing_date": None, "selling_date": None,
    }
    dates_found = False
    for script in scripts:
        try:
            data = json.loads(script)
        except json.JSONDecodeError:
            continue
        if not isinstance(data, dict):
            continue
        if "datePosted" in data:
            out["listing_date"] = data["datePosted"]
            dates_found = True
        if "dateSold" in data:
            out["selling_date"] = data["dateSold"]
            dates_found = True
        t = data.get("@type")
        if t in ("Appartement", "Product") or (isinstance(t, list) and "Appartement" in t):
            if "address" in data:
                out["street"] = data["address"].get("streetAddress")
                out["city"] = place.capitalize()
                out["postal_code"] = data["address"].get("postalCode")
            if "offers" in data and "price" in data["offers"]:
                out["price"] = data["offers"]["price"]
            if "floorSize" in data:
                try:
                    v = data["floorSize"].get("value", 0)
                    if v:
                        out["living_area"] = int(float(str(v)))
                except (ValueError, AttributeError):
                    pass

    if not dates_found:
        for s in SOLD_DATE_SELECTORS:
            v = sel.css_get(s)
            if v:
                d = normalize_dutch_date(v)
                if d:
                    if "Aangeboden" in s:
                        out["listing_date"] = d
                    elif "Verkoop" in s:
                        out["selling_date"] = d

    # HTML address fallback — funda_spider_sold.py:334-349
    if not out["street"] or not out["postal_code"]:
        addr = sel.css_get("h1.object-header__container span.text-neutral-40::text")
        if addr:
            m = SOLD_ADDR_RE.match(addr)
            if m:
                out["postal_code"] = m.group(1)
                out["city"] = m.group(2)
            street = sel.css_get("h1.object-header__container span.block::text")
            if street:
                out["street"] = street.strip()
    return out
