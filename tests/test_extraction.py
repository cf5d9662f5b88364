"""Parse-fixture conformance (SURVEY.md §5.1): the extractor must be
byte-identical to the analytic goldens derived from the reference code paths
(funda_spider.py:188-453, funda_spider_sold.py:188-402)."""

import duckdb
import pytest

from fundamental_ray.extraction import fields as F
from fundamental_ray.extraction.listing import (
    _FIELD_NAMES,
    extract_listing_row,
    place_from_url,
)
from fundamental_ray.extraction.listpage import (
    build_search_url,
    extract_listing_urls,
    extract_next_page,
)
from fundamental_ray.extraction.selectolite import Selector
from fundamental_ray.synth.materialize import SCRAPED_AT


def test_golden_listings_byte_identical(tiny_corpus):
    con = duckdb.connect()
    gold = con.sql(f"select * from '{tiny_corpus}/golden_listings.parquet'").df()
    pages = dict(con.sql(f"select url, html from '{tiny_corpus}/pages.parquet'").fetchall())
    assert len(gold) > 200
    for _, g in gold.iterrows():
        url = g["url"]
        mode = "sold" if g["status"] == "sold" else "active"
        got = extract_listing_row(
            bytes(pages[url]).decode(), url, place_from_url(url), mode, SCRAPED_AT
        )
        for f in _FIELD_NAMES:
            want = g[f] if g[f] == g[f] else None  # NaN → None
            assert got.get(f) == want, (g["family"], url, f, got.get(f), want)


def test_blocked_page_dropped():
    html = "<html><body>Je bent bijna op de pagina die je zoekt</body></html>"
    assert extract_listing_row(html, "u", "p") is None
    assert F.is_blocked_detail(403, "anything")
    assert F.is_blocked_list(302) and not F.is_blocked_list(200)


def test_energy_label_tiers():
    # tier 1 validation rejects invalid labels
    s = Selector("<dl><dt>Energielabel</dt><dd><span>Q</span></dd></dl>")
    assert F.extract_energy_label(s, []) is None
    # JSON-LD tier is unvalidated (reference quirk): A+++ passes
    script = '{"@type": "EnergyData", "energyLabel": "A+++"}'
    s = Selector(f'<script type="application/ld+json">{script}</script>')
    assert F.extract_energy_label(s, [script]) == "A+++"
    # a malformed script BEFORE the energy one aborts the whole JSON-LD tier
    assert F.extract_energy_label(s, ["{bad", script]) is None
    # description tier
    s = Selector('<div class="object-description__features"><li>energielabel b</li></div>')
    assert F.extract_energy_label(s, []) == "B"


def test_dutch_dates():
    assert F.normalize_dutch_date("3 mei 2024") == "2024-05-03"
    assert F.normalize_dutch_date("17 december 2023") == "2023-12-17"
    assert F.normalize_dutch_date("gisteren") is None


def test_street_split_regex_fallthrough():
    # '10-II' does not match the reference split regex → no street from title
    s = Selector('<h1 class="object-header__title">Prinsengracht 10-II</h1>')
    assert F.extract_street_active(s, []) is None
    s = Selector('<h1 class="object-header__title">Prinsengracht 10</h1>')
    assert F.extract_street_active(s, []) == "Prinsengracht 10"


def test_list_page_extraction_and_noise_filter():
    lp = (
        '<script type="application/ld+json">{"itemListElement":'
        '[{"url":"https://h/detail/koop/a/x-1/"},{"url":"https://h/makelaars/9/"}]}</script>'
        '<script type="application/ld+json">{bad</script>'
        '<div data-test-id="search-result-item"><a href="/detail/koop/a/y-2/">y</a></div>'
        '<div class="search-result__header-title-col"><a href="/detail/koop/a/z-3/">z</a></div>'
        '<div data-test-id="search-result-item"><a href="/koop/a/map/">map</a></div>'
    )
    s = Selector(lp)
    urls = extract_listing_urls(s, "https://h/zoeken/koop/?q=1")
    assert urls == {
        "https://h/detail/koop/a/x-1/",
        "https://h/detail/koop/a/y-2/",
        "https://h/detail/koop/a/z-3/",
    }
    # refresh mode uses the looser /koop/ needle (funda_spider.py:474)
    urls_r = extract_listing_urls(s, "https://h/zoeken/koop/?q=1", refresh=True)
    assert "https://h/koop/a/map/" in urls_r


def test_next_page_button_and_manual():
    s = Selector('<a data-test-id="next-page-button" href="https://h/zoeken/koop/?page=2">n</a>')
    assert extract_next_page(s, "https://h/zoeken/koop/", {}, 2) == "https://h/zoeken/koop/?page=2"
    s = Selector("<p>laatste pagina</p>")
    url = extract_next_page(
        s, "https://h/zoeken/koop/", {"sort": "date_down"}, 11
    )
    assert url == "https://h/zoeken/koop/?sort=date_down&page=11"


def test_search_url_shape():
    u = build_search_url("www.funda.nl", "amsterdam", "available")
    assert u.startswith("https://www.funda.nl/zoeken/koop/?selected_area=")
    assert "%5B%22amsterdam%22%5D" in u and "sort=date_down" in u


def test_pipeline_coercions():
    from fundamental_ray.extraction.listing import normalize_item

    it = normalize_item(
        {"price": "€ 450.000", "living_area": "62 m²", "num_rooms": "3 kamers", "year_built": " 1998 "}
    )
    assert it == {"price": 450000, "living_area": 62, "num_rooms": 3, "year_built": 1998}
    it = normalize_item({"price": "geen", "living_area": "veel", "num_rooms": "x", "year_built": "y"})
    assert all(v is None for v in it.values())
