"""Seed-list construction: city normalization + search-URL seeds (S1/S10/M16).

``normalize_city`` transcribes config.NormalizeCity
(server/config/cities.go:24-43): lowercase, the 's-Hertogenbosch special
case, collapse runs of spaces, spaces → hyphens, drop apostrophes.
``seed_chains`` is the metro-areas → unique-cities → per-city (active, sold)
chain expansion (config/cities.go:46-65; scheduler.go:154-206 crawls each
city with both spiders).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_SPACES = re.compile(r"\s+")


def normalize_city(city: str) -> str:
    normalized = city.lower()
    if normalized in ("'s-hertogenbosch", "s-hertogenbosch"):
        return "den-bosch"
    normalized = _SPACES.sub(" ", normalized)
    normalized = normalized.replace(" ", "-")
    return normalized.replace("'", "")


@dataclass
class MetroArea:
    name: str
    cities: list[str]


def unique_cities(areas: list[MetroArea]) -> list[str]:
    """Normalized-deduped city list (last original wins per normalized key,
    matching the Go map semantics — iteration order made deterministic by
    sorting the normalized keys)."""
    uniq: dict[str, str] = {}
    for area in areas:
        for city in area.cities:
            uniq[normalize_city(city)] = city
    return [uniq[k] for k in sorted(uniq)]


def seed_chains(areas: list[MetroArea], host: str = "www.funda.nl"):
    """One (active, sold) ChainState pair per unique normalized city."""
    from .frontier import ChainState
    from ..extraction.listpage import build_search_url

    chains = []
    cid = 0
    for city in unique_cities(areas):
        place = normalize_city(city)
        for avail in ("available", "unavailable"):
            chains.append(
                ChainState(
                    chain_id=cid, host=host, place=place, availability=avail,
                    next_url=build_search_url(host, place, avail),
                )
            )
            cid += 1
    return chains
