"""robots.txt enforcement (north_rule; the reference disables it —
ROBOTSTXT_OBEY = False, settings.py:12 — so obey=False reproduces reference
parity and obey=True is the rebuild default).

Rules are tiny per host → parsed once on the driver, broadcast via ray.put,
checked inside map_batches (no shuffle). Supported directives (RFC 9309
semantics, the same set Scrapy's protego honors): ``User-agent: *`` groups,
``Disallow:`` / ``Allow:`` path rules including the ``*`` wildcard and the
``$`` end-of-path anchor, precedence by rule length (octets of the rule
string) with Allow winning length ties, and ``Crawl-delay: N`` (folded into
the per-host politeness budget).

Rule matching is two-tier: plain prefix rules (the overwhelming majority of
real robots files) stay on the numpy ``np.char.startswith`` fast path;
rules containing ``*``/``$`` are compiled ONCE at parse time to anchored
regexes and applied only to the gated hosts' rows.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlsplit


def _compile_rule(rule: str) -> "re.Pattern | None":
    """RFC 9309 rule → anchored regex, or None for plain-prefix rules
    (fast path). ``*`` matches any char sequence; a TRAILING ``$`` anchors
    the end of the path; ``$`` anywhere else is a literal octet."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    if "*" not in body and not anchored:
        return None
    pat = ".*".join(re.escape(part) for part in body.split("*"))
    return re.compile("^" + pat + ("$" if anchored else ""))


@dataclass
class HostRules:
    disallow: list[str] = field(default_factory=list)
    allow: list[str] = field(default_factory=list)
    crawl_delay: float | None = None
    # parallel to disallow/allow: compiled regex for wildcard rules,
    # None for plain prefixes
    disallow_re: list = field(default_factory=list)
    allow_re: list = field(default_factory=list)

    def _match_len(self, path: str, rules, regexes) -> int:
        best = -1
        for rule, rx in zip(rules, regexes):
            hit = rx.match(path) if rx is not None else path.startswith(rule)
            if hit:
                best = max(best, len(rule))
        return best

    def allowed(self, path: str) -> bool:
        d = self._match_len(path, self.disallow, self.disallow_re)
        if d < 0:
            return True
        a = self._match_len(path, self.allow, self.allow_re)
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
                rules.disallow_re.append(_compile_rule(val))
        elif in_star and key == "allow":
            if val:
                rules.allow.append(val)
                rules.allow_re.append(_compile_rule(val))
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
        matching (plain rules) / one compiled-regex pass per wildcard rule
        of only the gated hosts' url paths (longest rule wins, Allow wins
        ties — the same RFC 9309 semantics as the scalar ``allowed``).
        Returns a numpy bool mask."""
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

        def rule_lens(p: np.ndarray, rules, regexes) -> np.ndarray:
            best = np.full(len(p), -1)
            for rule, rx in zip(rules, regexes):
                if rx is None:
                    hit = np.char.startswith(p, rule)
                else:
                    hit = np.fromiter(
                        (rx.match(x) is not None for x in p), bool, len(p)
                    )
                best = np.where(hit, np.maximum(best, len(rule)), best)
            return best

        for h in gated:
            idx = np.nonzero(hosts == h)[0]
            r = self.rules[h]
            p = paths[idx].astype(str)
            d_len = rule_lens(p, r.disallow, r.disallow_re)
            a_len = rule_lens(p, r.allow, r.allow_re)
            mask[idx] = (d_len < 0) | (a_len >= d_len)
        return mask

    def crawl_delay(self, host: str) -> float | None:
        r = self.rules.get(host)
        return r.crawl_delay if r else None
