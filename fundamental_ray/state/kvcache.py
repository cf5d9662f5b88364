"""Keyed cache actor with a token-bucket rate limiter (S8/T4).

The reference's geocode cache is a process-wide map persisted to JSON with
an RWMutex plus a 1 req/s Nominatim limiter (internal/geocoding/
geocoder.go:44-93,124,200-203). The rebuild's equivalent is a small keyed
actor pool: ``get_or_compute`` consults the cache, and cache misses draw
from a token bucket whose clock is *logical* (advance(t) calls), keeping
behavior deterministic and wall-clock-free. Shard by ``hash(key) % pool``
for throughput; a snapshot round-trips to JSON like the reference's file.
"""

from __future__ import annotations

import json
import os


class KeyedCacheActor:
    """One shard: cache map + logical-clock token bucket."""

    def __init__(self, rate_per_sec: float = 1.0, burst: float = 1.0):
        self.cache: dict[str, object] = {}
        self.rate = rate_per_sec
        self.burst = burst
        self.tokens = burst
        self.clock = 0.0
        self.misses = 0
        self.hits = 0
        self.rejected = 0

    def advance(self, dt: float) -> None:
        self.clock += dt
        self.tokens = min(self.burst, self.tokens + dt * self.rate)

    def get_or_compute(self, key: str, computed_value) -> tuple[object, str]:
        """Returns (value, status): 'hit' | 'computed' | 'rate_limited'.
        ``computed_value`` is the would-be result of the expensive call (the
        caller resolves it; the actor only arbitrates cache + budget)."""
        if key in self.cache:
            self.hits += 1
            return self.cache[key], "hit"
        if self.tokens < 1.0:
            self.rejected += 1
            return None, "rate_limited"
        self.tokens -= 1.0
        self.cache[key] = computed_value
        self.misses += 1
        return computed_value, "computed"

    def stats(self) -> dict:
        return {
            "size": len(self.cache), "hits": self.hits,
            "misses": self.misses, "rejected": self.rejected,
        }

    def snapshot(self, path: str) -> int:
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self.cache, fh, sort_keys=True)
        os.replace(tmp, path)
        return len(self.cache)

    def restore(self, path: str) -> int:
        with open(path) as fh:
            self.cache = json.load(fh)
        return len(self.cache)
