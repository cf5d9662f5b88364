"""URL canonicalization (M17) — the keyed identity of the URL-seen set.

The reference dedupes on exact URL strings (funda_spider.py:118-120); the
rebuild makes the identity explicit per BASELINE.json north_rule
("canonicalized/normalized listing URLs"): lowercase scheme+host, strip
fragment and default ports, sort query parameters, collapse empty query.
Canonicalization is idempotent and pure, so it can run vectorized-ish in any
map_batches stage before the hash exchange.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    s = urlsplit(url.strip())
    scheme = s.scheme.lower()
    host = s.hostname.lower() if s.hostname else ""
    port = s.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    query = urlencode(sorted(parse_qsl(s.query, keep_blank_values=True)))
    path = s.path or "/"
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    h = urlsplit(url).hostname
    return h.lower() if h else ""


def url_shard(url_norm: str, num_shards: int) -> int:
    """Stable shard routing for the seen-set actor pool. Uses Python's
    deterministic string hash replacement (zlib.crc32 of utf-8) so routing is
    identical across processes and runs."""
    import zlib

    return zlib.crc32(url_norm.encode("utf-8")) % num_shards
