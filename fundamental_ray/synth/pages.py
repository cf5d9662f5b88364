"""Deterministic synthetic pages table (FIXTURES.md §1-§7).

Pure function of (seed, scale knobs): every value is derived from
blake2b(key) digests, so generation is order-independent, parallelizable,
and byte-identical across runs. No wall-clock anywhere.

The corpus mirrors the URL universe and page families of the reference
(funda_spider.py:50-59,92-184; FIXTURES.md): per (host, place, availability)
chain a pagination sequence of list pages with the FIXTURES §4 layout, plus
one detail page per listing drawn from the extraction fixture families A-G,
plus noise URLs that the '/detail/koop/' predicate must drop.

Each detail listing also carries an **analytic golden** — the extraction
output derived from the reference's code paths by construction (NOT by
running our extractor), used as the byte-identical parse oracle.
"""

from __future__ import annotations

import hashlib
import json
import struct
from dataclasses import dataclass, field

SEED = 42

STREETS = [
    "Keizersgracht", "Herengracht", "Prinsengracht", "Singel", "Rozengracht",
    "Overtoom", "Sarphatistraat", "Linnaeusstraat", "Hoofdweg", "Amstelveenseweg",
    "Middenweg", "Ceintuurbaan", "Stadhouderskade", "Weteringschans", "Spuistraat",
]
NEIGHBORHOODS = ["Centrum", "Jordaan", "De Pijp", "Oost", "West", "Zuid", "Noord", "Bos en Lommer"]
ENERGY_LABELS = ["A++", "A+", "A", "B", "C", "D", "E", "F", "G"]
DUTCH_MONTH_NAMES = [
    "januari", "februari", "maart", "april", "mei", "juni", "juli",
    "augustus", "september", "oktober", "november", "december",
]
PLACES = ["amsterdam", "rotterdam", "utrecht", "den-haag", "eindhoven", "groningen"]

ACTIVE_FAMILIES = ["A", "B", "C", "D", "D2", "D3", "E", "G"]
SOLD_FAMILIES = ["SA", "SE", "SG"]
BLOCK_EVERY = 23  # every 23rd listing's detail page is the blocked interstitial (family F)

LISTINGS_PER_PAGE = 15


def _h(*key) -> int:
    d = hashlib.blake2b("|".join(str(k) for k in key).encode(), digest_size=8).digest()
    return struct.unpack(">Q", d)[0]


@dataclass
class Chain:
    chain_id: int
    host: str
    place: str
    availability: str  # 'available' | 'unavailable'
    layout: str        # 'standard' (FIXTURES §4 10-page) | 'short' (2 new + 3 empty)

    @property
    def mode(self) -> str:
        return "active" if self.availability == "available" else "sold"

    @property
    def n_pages(self) -> int:
        return 10 if self.layout == "standard" else 5


@dataclass
class Listing:
    chain: Chain
    listing_id: int
    family: str = ""
    f: dict = field(default_factory=dict)

    def __post_init__(self):
        c, lid = self.chain, self.listing_id
        h = lambda tag: _h(SEED, "listing", c.chain_id, lid, tag)
        blocked = (h("blocked") % BLOCK_EVERY) == 0
        if blocked:
            self.family = "F"
        elif c.mode == "sold":
            self.family = SOLD_FAMILIES[h("family") % len(SOLD_FAMILIES)]
        else:
            self.family = ACTIVE_FAMILIES[h("family") % len(ACTIVE_FAMILIES)]
        street = STREETS[h("street") % len(STREETS)]
        number = 1 + h("number") % 299
        m = h("month") % 12
        d = 1 + h("day") % 28
        sm = h("smonth") % 12
        sd = 1 + h("sday") % 28
        self.f = {
            "street_name": street,
            "house_number": number,
            "street": f"{street} {number}",
            "neighborhood": NEIGHBORHOODS[h("nbh") % len(NEIGHBORHOODS)],
            "property_type": "appartement" if h("ptype") % 2 else "huis",
            "postal_code": f"{1000 + h('pc4') % 100} {chr(65 + h('pcA') % 26)}{chr(65 + h('pcB') % 26)}",
            "price": 150_000 + h("price") % 850_000,
            "year_built": 1900 + h("year") % 125,
            "living_area": 20 + h("area") % 180,
            "num_rooms": 1 + h("rooms") % 7,
            "energy_label": ENERGY_LABELS[h("energy") % len(ENERGY_LABELS)],
            "month_idx": m, "day": d,
            "listing_date": f"2024-{m + 1:02d}-{d:02d}",
            "listing_date_nl": f"{d} {DUTCH_MONTH_NAMES[m]} 2024",
            "selling_date": f"2024-{sm + 1:02d}-{sd:02d}",
            "selling_date_nl": f"{sd} {DUTCH_MONTH_NAMES[sm]} 2024",
            "slug": f"{'appartement' if h('ptype') % 2 else 'huis'}-{street.lower()}-{number}",
        }

    @property
    def url(self) -> str:
        c = self.chain
        return f"https://{c.host}/detail/koop/{c.place}/{self.f['slug']}-{self.listing_id}/"

    # ---------------- HTML builders per family -------------------------
    def html(self) -> str:
        f, c = self.f, self.chain
        fam = self.family
        if fam == "F":
            return (
                "<html><body><h1>Even geduld</h1>"
                "<p>Je bent bijna op de pagina die je zoekt.</p></body></html>"
            )
        title = f"<title>{f['street']} {f['postal_code']} {c.place.capitalize()}</title>"
        crumb = (
            f'<nav aria-label="Breadcrumb"><span>Koop</span>'
            f"<span>{f['property_type']}</span><span>{f['neighborhood']}</span></nav>"
        )
        dl = (
            f"<dl><dt>Energielabel</dt><dd><span>{f['energy_label']}</span></dd>"
            f"<dt>Bouwjaar</dt><dd>{f['year_built']}</dd>"
            f"<dt>Aantal kamers</dt><dd>{f['num_rooms']} kamers ({max(1, f['num_rooms'] - 1)} slaapkamers)</dd>"
            f"<dt>Woonoppervlakte</dt><dd>{f['living_area']} m²</dd>"
            f"<dt>Aangeboden sinds</dt><dd>{f['listing_date_nl']}</dd></dl>"
        )
        header_spans = (
            f'<h1 class="object-header__container">'
            f'<span class="object-header__street">{f["street_name"]}</span>'
            f'<span class="object-header__house-number">{f["house_number"]}</span></h1>'
        )
        jsonld_product = "<script type=\"application/ld+json\">" + json.dumps(
            {
                "@type": "Product",
                "address": {
                    "streetAddress": f["street"],
                    "postalCode": f["postal_code"],
                    "addressLocality": f"{f['neighborhood']}, {c.place.capitalize()}",
                },
                "offers": {"price": f["price"]},
                "floorSize": {"value": str(f["living_area"])},
            }
        ) + "</script>"
        filler = f"<p>Ruime woning ({self.listing_id}) in {f['neighborhood']} met {f['num_rooms']} kamers.</p>"

        if fam == "A":
            body = title + crumb + header_spans + jsonld_product + dl + filler
        elif fam == "B":
            body = (
                title + crumb + header_spans
                + '<script type="application/ld+json">{not json</script>'
                + f"<dl><dt>Vraagprijs</dt><dd><span>€ {f['price']:,} k.k.</span></dd>".replace(",", ".")
                + f"<dt>Bouwjaar</dt><dd>{f['year_built']}</dd>"
                + f"<dt>Aantal kamers</dt><dd>{f['num_rooms']} kamers</dd>"
                + f"<dt>Aangeboden sinds</dt><dd>{f['listing_date_nl']}</dd></dl>"
                + f'<span data-test-id="energy-label">{f["energy_label"]}</span>'
                + f'<ul><li>Woonoppervlakte <span class="fd-text--emphasis">{f["living_area"]} m²</span></li></ul>'
                + filler
            )
        elif fam == "C":
            body = (
                title + crumb
                + f'<h1 class="object-header__title">{f["street"]}</h1>'
                + f'<div class="listing-price"><span>€ {f["price"]:,}</span></div>'.replace(",", ".")
                + dl + filler
            )
        elif fam == "D":
            body = (
                title + crumb + header_spans
                + f"<dl><dt>Vraagprijs</dt><dd><span>€ {f['price']:,} k.k.</span></dd>".replace(",", ".")
                + f"<dt>Bouwjaar</dt><dd>{f['year_built']}</dd>"
                + f"<dt>Aantal kamers</dt><dd>{f['num_rooms']} kamers</dd>"
                + f"<dt>Woonoppervlakte</dt><dd>{f['living_area']} m²</dd></dl>"
                + '<div class="object-description__features"><ul>'
                + f"<li>energielabel {f['energy_label'].lower()}</li></ul></div>"
                + filler
            )
        elif fam == "D2":  # invalid label everywhere → null
            body = (
                title + crumb + header_spans
                + "<dl><dt>Energielabel</dt><dd><span>Q</span></dd>"
                + f"<dt>Bouwjaar</dt><dd>{f['year_built']}</dd></dl>" + filler
            )
        elif fam == "D3":  # JSON-LD tier quirk: unvalidated A+++ passes through
            body = (
                title + crumb + header_spans + dl.replace(
                    f"<dt>Energielabel</dt><dd><span>{f['energy_label']}</span></dd>", ""
                )
                + '<script type="application/ld+json">'
                + '{"@type": "EnergyData", "energyLabel": "A+++"}</script>'
                + filler
            )
        elif fam == "E":  # same shape as A; exercises the Dutch-date matrix
            body = title + crumb + header_spans + jsonld_product + dl + filler
        elif fam == "G":  # sparse: address only, everything else null
            body = title + f'<h1 class="object-header__title">{f["street"]}</h1>' + filler
        elif fam == "SA":
            jd = "<script type=\"application/ld+json\">" + json.dumps(
                {
                    "@type": "Appartement",
                    "datePosted": f["listing_date"],
                    "dateSold": f["selling_date"],
                    "address": {"streetAddress": f["street"], "postalCode": f["postal_code"]},
                    "offers": {"price": f["price"]},
                    "floorSize": {"value": str(f["living_area"])},
                }
            ) + "</script>"
            body = (
                title + jd
                + f"<dl><dt>Energielabel</dt><dd><span>{f['energy_label']}</span></dd>"
                + f"<dt>Bouwjaar</dt><dd>gebouwd in {f['year_built']}</dd>"
                + f"<dt>Aantal kamers</dt><dd>{f['num_rooms']}kamers</dd></dl>" + filler
            )
        elif fam == "SE":
            body = (
                title
                + '<h1 class="object-header__container">'
                + f'<span class="block">{f["street"]}</span>'
                + f'<span class="text-neutral-40">{f["postal_code"]} {c.place.capitalize()}</span></h1>'
                + f"<dl><dt>Aangeboden sinds</dt><dd>{f['listing_date_nl']}</dd>"
                + f"<dt>Verkoopdatum</dt><dd>{f['selling_date_nl']}</dd>"
                + f"<dt>Bouwjaar</dt><dd>{f['year_built']}</dd>"
                + f"<dt>Aantal kamers</dt><dd>{f['num_rooms']} kamers</dd>"
                + f"<dt>Woonoppervlakte</dt><dd>{f['living_area']} m²</dd>"
                + f"<dt>Energielabel</dt><dd>{f['energy_label']}</dd></dl>" + filler
            )
        else:  # SG sparse sold: floorSize 0 falls through to (absent) HTML → null
            body = (
                title
                + '<script type="application/ld+json">'
                + json.dumps({"@type": "Product", "floorSize": {"value": 0},
                              "offers": {"price": f["price"]},
                              "address": {"streetAddress": f["street"], "postalCode": f["postal_code"]}})
                + "</script>" + filler
            )
        return f"<html><head>{title}</head><body>{body}</body></html>"

    # ---------------- analytic golden (reference code-path derivation) --
    def golden(self, scraped_at: str) -> dict | None:
        """Expected FundaItem for this detail page, or None when blocked.

        Derived from the reference control flow per family — kept separate
        from the extractor so tests are not circular."""
        if self.family == "F":
            return None
        f, c = self.f, self.chain
        g = {
            "url": self.url, "street": None, "neighborhood": None,
            "property_type": None, "city": None, "postal_code": None,
            "price": None, "year_built": None, "living_area": None,
            "num_rooms": None, "status": "sold" if c.mode == "sold" else "active",
            "listing_date": None, "selling_date": None, "energy_label": None,
            "scraped_at": scraped_at,
        }
        cap = c.place.capitalize()
        fam = self.family
        if fam in ("A", "E"):
            g.update(
                street=f["street"], neighborhood=f["neighborhood"], city=cap,
                property_type=f["property_type"], postal_code=f["postal_code"],
                price=f["price"], year_built=f["year_built"],
                living_area=f["living_area"], num_rooms=f["num_rooms"],
                energy_label=f["energy_label"], listing_date=f["listing_date"],
            )
        elif fam == "B":
            # malformed JSON-LD aborts every JSON-LD tier → HTML everywhere
            g.update(
                street=f["street"], neighborhood=f["neighborhood"], city=cap,
                property_type=f["property_type"], postal_code=f["postal_code"],
                price=f["price"], year_built=f["year_built"],
                living_area=f["living_area"], num_rooms=f["num_rooms"],
                energy_label=f["energy_label"], listing_date=f["listing_date"],
            )
        elif fam == "C":
            g.update(
                street=f["street"], neighborhood=f["neighborhood"], city=cap,
                property_type=f["property_type"], postal_code=f["postal_code"],
                price=f["price"], year_built=f["year_built"],
                living_area=f["living_area"], num_rooms=f["num_rooms"],
                energy_label=f["energy_label"], listing_date=f["listing_date"],
            )
        elif fam == "D":
            g.update(
                street=f["street"], neighborhood=f["neighborhood"], city=cap,
                property_type=f["property_type"], postal_code=f["postal_code"],
                price=f["price"], year_built=f["year_built"],
                living_area=f["living_area"], num_rooms=f["num_rooms"],
                energy_label=f["energy_label"],
            )
        elif fam == "D2":
            g.update(
                street=f["street"], neighborhood=f["neighborhood"], city=cap,
                property_type=f["property_type"], postal_code=f["postal_code"],
                year_built=f["year_built"], energy_label=None,
            )
        elif fam == "D3":
            g.update(
                street=f["street"], neighborhood=f["neighborhood"], city=cap,
                property_type=f["property_type"], postal_code=f["postal_code"],
                price=None, year_built=f["year_built"],
                living_area=f["living_area"], num_rooms=f["num_rooms"],
                energy_label="A+++", listing_date=f["listing_date"],
            )
        elif fam == "G":
            # no breadcrumb, no JSON-LD → neighborhood/city/postal all None
            g.update(street=f["street"])
        elif fam == "SA":
            g.update(
                street=f["street"], city=cap, postal_code=f["postal_code"],
                price=f["price"], living_area=f["living_area"],
                year_built=f["year_built"], num_rooms=f["num_rooms"],
                energy_label=f["energy_label"],
                listing_date=f["listing_date"], selling_date=f["selling_date"],
            )
        elif fam == "SE":
            g.update(
                street=f["street"], city=cap, postal_code=f["postal_code"],
                year_built=f["year_built"], num_rooms=f["num_rooms"],
                living_area=f["living_area"], energy_label=f["energy_label"],
                listing_date=f["listing_date"], selling_date=f["selling_date"],
            )
        else:  # SG — address branch sets city too (funda_spider_sold.py:273)
            g.update(street=f["street"], city=cap, postal_code=f["postal_code"], price=f["price"])
        return g
