"""Corpus builder: chains → pages-table rows + analytic crawl goldens.

A *chain* is one (host, place, availability) pagination sequence — the unit
the reference crawls per spider run (funda_spider.py:50-59). The page layout
follows FIXTURES.md §4:

- ``standard``: pages 1-3 all-new (15/page), page 4 = 50 % overlap with
  page 3, pages 5-7 all-seen, pages 8-10 empty
- ``short``: pages 1-2 all-new, pages 3-5 empty

``simulate_reference_crawl`` re-implements the reference spider's per-page
control flow (funda_spider.py:84-186 / funda_spider_sold.py:84-186) over the
generator's *ground-truth* page contents (not over HTML), producing the
golden page-visit sequence + final URL-seen set of SURVEY.md §3.1.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..extraction.listpage import build_search_url
from .pages import LISTINGS_PER_PAGE, PLACES, Chain, Listing, _h, SEED

EPOCH_US = 1704067200000000  # 2024-01-01T00:00:00Z in microseconds


def make_chains(n_chains: int, n_hosts: int = 4, zipf_s: float = 0.0) -> list[Chain]:
    """Deterministic chain list. With zipf_s>0 hosts follow a heavy-tailed
    Zipf(s) distribution over n_hosts mirrors (FIXTURES §6 skew variant);
    otherwise round-robin. Host 0 is www.funda.nl, others are mirrors."""
    hosts = ["www.funda.nl"] + [f"funda-{k}.example" for k in range(1, n_hosts)]
    if zipf_s > 0:
        weights = [1.0 / (k + 1) ** zipf_s for k in range(n_hosts)]
        total = sum(weights)
        cum, acc = [], 0.0
        for w in weights:
            acc += w / total
            cum.append(acc)
    chains = []
    for i in range(n_chains):
        if zipf_s > 0:
            u = (_h(SEED, "chainhost", i) % 10**9) / 10**9
            hi = next(k for k, c in enumerate(cum) if u <= c)
        else:
            hi = i % n_hosts
        chains.append(
            Chain(
                chain_id=i,
                host=hosts[hi],
                # place is unique per chain so (host, place, availability) —
                # hence every page URL — is collision-free even under the
                # Zipf host draw
                place=PLACES[i % len(PLACES)] + ("" if i < len(PLACES) else f"-{i // len(PLACES)}"),
                availability="available" if i % 2 == 0 else "unavailable",
                layout="short" if i % 4 == 3 else "standard",
            )
        )
    return chains


@dataclass
class PageSpec:
    chain: Chain
    page_no: int
    url: str
    listings: list[Listing]  # ground truth listing objects on this page
    has_next_button: bool


def chain_pages(chain: Chain) -> list[PageSpec]:
    lid0 = (
        chain.listing_owner if chain.listing_owner is not None else chain.chain_id
    ) * 100_000
    if chain.layout == "standard":
        uniq = [Listing(chain, lid0 + j) for j in range(53)]
        per_page = [
            uniq[0:15], uniq[15:30], uniq[30:45],
            uniq[38:45] + uniq[45:53],          # page 4: 7 repeats + 8 new
            uniq[0:15], uniq[15:30], uniq[30:45],  # pages 5-7 all-seen
            [], [], [],                           # pages 8-10 empty
        ]
    else:
        uniq = [Listing(chain, lid0 + j) for j in range(30)]
        per_page = [uniq[0:15], uniq[15:30], [], [], []]
    specs = []
    n = len(per_page)
    for p, ls in enumerate(per_page, start=1):
        url = build_search_url(chain.host, chain.place, chain.availability, None if p == 1 else p)
        specs.append(PageSpec(chain, p, url, ls, has_next_button=p < n))
    return specs


def unique_listings(chain: Chain) -> list[Listing]:
    seen, out = set(), []
    for spec in chain_pages(chain):
        for l in spec.listings:
            if l.listing_id not in seen:
                seen.add(l.listing_id)
                out.append(l)
    return out


# ---------------------------------------------------------------- HTML

def list_page_html(spec: PageSpec) -> str:
    """List-page markup exercising both M1 paths: JSON-LD carries the even-
    indexed listings (absolute URLs), HTML anchors the odd-indexed ones
    (relative URLs) plus one search-result__header-title-col variant; noise
    URLs appear in both and must be dropped by the /detail/koop/ predicate."""
    import json as _json

    c = spec.chain
    jd_items = [{"url": l.url} for i, l in enumerate(spec.listings) if i % 2 == 0]
    jd_items.append({"url": f"https://{c.host}/makelaars/{spec.page_no}/"})
    jd_items.append({"name": "no-url-entry"})
    jsonld = '<script type="application/ld+json">' + _json.dumps(
        {"@type": "ItemList", "itemListElement": jd_items}
    ) + "</script>"
    anchors = []
    for i, l in enumerate(spec.listings):
        if i % 2 == 1:
            rel = l.url.split(c.host, 1)[1]  # relative href → urljoin path
            div_cls = (
                '<div class="search-result__header-title-col">'
                if i % 4 == 3
                else '<div data-test-id="search-result-item">'
            )
            anchors.append(f'{div_cls}<a href="{rel}">{l.f["street"]}</a></div>')
    anchors.append(f'<div data-test-id="search-result-item"><a href="/koop/{c.place}/map/">kaart</a></div>')
    nxt = ""
    if spec.has_next_button:
        nxt_url = build_search_url(c.host, c.place, c.availability, spec.page_no + 1)
        nxt = f'<a data-test-id="next-page-button" href="{nxt_url}">Volgende</a>'
    malformed = '<script type="application/ld+json">{oops</script>' if spec.page_no % 3 == 0 else ""
    return (
        f"<html><head><title>Koopwoningen in {c.place} pagina {spec.page_no}</title></head>"
        f"<body>{jsonld}{malformed}{''.join(anchors)}{nxt}</body></html>"
    )


_TAG_RE = re.compile(r"<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<[^>]+>", re.S)
_WS_RE = re.compile(r"\s+")


def visible_text(html: str) -> str:
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", html)).strip()


# ------------------------------------------------------------- rows

def chain_rows(chain: Chain) -> list[dict]:
    """All pages-table rows for one chain (list + detail + host noise pages).
    warc_ts = EPOCH + row_ordinal minutes, ordinal deterministic per chain."""
    rows = []
    ordinal = 0

    def add(url: str, html: str, lang: str = "nl"):
        nonlocal ordinal
        ts = EPOCH_US + (chain.chain_id * 1_000 + ordinal) * 60_000_000
        rows.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": html.encode("utf-8"),
                "text": visible_text(html),
                "lang": lang,
            }
        )
        ordinal += 1

    for spec in chain_pages(chain):
        add(spec.url, list_page_html(spec))
    if chain.listing_owner is not None:
        return rows  # detail + noise pages are emitted by the owner chain
    for l in unique_listings(chain):
        lang = "en" if _h(SEED, "lang", l.listing_id) % 17 == 0 else "nl"
        add(l.url, l.html(), lang)
    add(
        f"https://{chain.host}/makelaars/{chain.chain_id}/",
        f"<html><body><h1>Makelaars {chain.chain_id}</h1></body></html>",
    )
    add(
        f"https://{chain.host}/koop/{chain.place}/map/",
        "<html><body><div id='map'></div></body></html>",
    )
    return rows


# --------------------------------------------------- reference simulator

@dataclass
class PageVisit:
    chain_id: int
    page_seq: int
    page_url: str
    found: int
    new: int
    skipped: int


def simulate_reference_crawl(
    chain: Chain, existing_urls: frozenset[str] = frozenset(), max_pages: int | None = None
) -> tuple[list[PageVisit], set[str], set[str]]:
    """Reference spider control flow over ground-truth page contents.

    Returns (page visits, processed detail urls, blocked detail urls).
    Mirrors funda_spider.py:84-186 (active) / funda_spider_sold.py:84-186
    (sold): per-page anti-join against processed ∪ existing, empty-page and
    no-new-page stop counters, pagination gated by max_pages. Detail pages
    whose body is the interstitial are requested but dropped (M3) — they
    still enter processed_urls (claimed before the request,
    funda_spider.py:150)."""
    specs = {s.page_no: s for s in chain_pages(chain)}
    processed: set[str] = set()
    blocked: set[str] = set()
    visits: list[PageVisit] = []
    empty_count = 0
    no_new_count = 0
    sold = chain.mode == "sold"
    page = 1
    while True:
        spec = specs.get(page)
        if spec is None:
            break  # page request 404s in the live crawl / absent from table
        all_urls = {l.url for l in spec.listings}
        new_urls = {u for u in all_urls if u not in processed and u not in existing_urls}
        visits.append(
            PageVisit(chain.chain_id, page, spec.url, len(all_urls), len(new_urls), len(all_urls) - len(new_urls))
        )
        if not all_urls:
            empty_count += 1
            if empty_count >= 3:
                break
        else:
            empty_count = 0
        if sold:
            if not new_urls and all_urls:
                break
        else:
            if not new_urls:
                no_new_count += 1
                if no_new_count >= 3:
                    break
            else:
                no_new_count = 0
        for l in spec.listings:
            if l.url in new_urls:
                processed.add(l.url)
                if l.family == "F":
                    blocked.add(l.url)
        if max_pages is not None and page >= max_pages:
            break
        page += 1
    return visits, processed, blocked
