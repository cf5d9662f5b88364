"""robots.txt enforcement (north_rule; the reference disables it —
ROBOTSTXT_OBEY = False, settings.py:12 — so obey=False reproduces reference
parity and obey=True is the rebuild default).

Rules are tiny per host → parsed once on the driver, broadcast via ray.put,
checked inside map_batches (no shuffle). Supported directives (the subset
the fixtures exercise, per the public robots.txt RFC 9309 semantics):
``User-agent: *`` groups, ``Disallow:`` path prefixes, ``Allow:`` path
prefixes (longest-prefix wins), ``Crawl-delay: N`` (folded into the per-host
politeness budget)."""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlsplit


@dataclass
class HostRules:
    disallow: list[str] = field(default_factory=list)
    allow: list[str] = field(default_factory=list)
    crawl_delay: float | None = None

    def allowed(self, path: str) -> bool:
        d = max((len(p) for p in self.disallow if path.startswith(p)), default=-1)
        if d < 0:
            return True
        a = max((len(p) for p in self.allow if path.startswith(p)), default=-1)
        return a >= d


def parse_robots(body: str) -> HostRules:
    rules = HostRules()
    in_star = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            in_star = val == "*"
        elif in_star and key == "disallow":
            if val:
                rules.disallow.append(val)
        elif in_star and key == "allow":
            if val:
                rules.allow.append(val)
        elif in_star and key == "crawl-delay":
            try:
                rules.crawl_delay = float(val)
            except ValueError:
                pass
    return rules


class RobotsTable:
    """host → HostRules; missing host ⇒ allow-all (like a 404 robots.txt)."""

    def __init__(self, rules_by_host: dict[str, HostRules]):
        self.rules = rules_by_host

    @classmethod
    def from_rows(cls, rows: list[tuple[str, str]]) -> "RobotsTable":
        return cls({host: parse_robots(body) for host, body in rows})

    def allowed(self, url: str) -> bool:
        s = urlsplit(url)
        r = self.rules.get(s.hostname.lower() if s.hostname else "")
        return r.allowed(s.path or "/") if r else True

    def allowed_mask(self, hosts, urls) -> "object":
        """Vectorized gate over parallel host/url arrays: host-level rule
        lookup first — hosts without rules (the overwhelming majority of a
        web-scale frontier) cost ZERO per-row work — then numpy prefix
        matching of only the gated hosts' url paths against their
        Allow/Disallow lists (longest-prefix wins, same semantics as the
        scalar ``allowed``). Returns a numpy bool mask."""
        import numpy as np
        import pandas as pd

        hosts = np.asarray(hosts, dtype=object)
        mask = np.ones(len(hosts), dtype=bool)
        gated = set(pd.unique(hosts)) & set(self.rules)
        if not gated:
            return mask
        paths = (
            pd.Series(np.asarray(urls, dtype=object))
            .str.replace(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "", regex=True)
            # urlsplit (the scalar path) drops BOTH query and fragment, so
            # strip '#fragment' before '?query' to keep the semantics equal
            .str.split("#").str[0]
            .str.split("?").str[0]
            .replace("", "/")
            .to_numpy()
        )
        for h in gated:
            idx = np.nonzero(hosts == h)[0]
            r = self.rules[h]
            p = paths[idx].astype(str)
            d_len = np.full(len(p), -1)
            for pref in r.disallow:
                d_len = np.where(
                    np.char.startswith(p, pref), np.maximum(d_len, len(pref)), d_len
                )
            a_len = np.full(len(p), -1)
            for pref in r.allow:
                a_len = np.where(
                    np.char.startswith(p, pref), np.maximum(a_len, len(pref)), a_len
                )
            mask[idx] = (d_len < 0) | (a_len >= d_len)
        return mask

    def crawl_delay(self, host: str) -> float | None:
        r = self.rules.get(host)
        return r.crawl_delay if r else None
