"""Geocoding stage: address → (lat, lng) over new store rows (S8).

Reproduces the reference's geocode flow end-to-end:

- ``Geocoder.GeocodeAddress`` (geocoder.go:100-189): cache keyed by
  ``street|postal_code|city``; a cache hit is free, a miss pays the 1 req/s
  Nominatim budget (geocoder.go:124 sleeps one second per call). No
  network here, so the resolver is a DETERMINISTIC SYNTHETIC Nominatim:
  md5-derived coordinates in a Netherlands-ish box, with ~10 % of
  addresses "not found" (geocoder.go:168-171's empty-result path). md5 is
  used deliberately — DuckDB computes the same digest, so the driver
  oracle can recompute every coordinate in pure SQL.
- ``Database.UpdateMissingCoordinates`` (database.go:620-759): rows with
  missing coordinates AND ``geocoding_attempted = 0`` AND non-null
  street/postal/city are geocoded in batches of 10; successes write
  (lat, lng, attempted=1), failures write attempted=1 only — an address
  is attempted once, NEVER retried (database.go:680-719).

The cache + rate budget live in a small actor pool (stateful stage);
store rows stream through ``map_batches`` and only eligible rows ever
reach an actor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray

GEOCODE_FAIL_MOD = 10  # 1 in 10 addresses resolves to "no results found"


def geocode_key(street: str, postal_code: str, city: str) -> str:
    # geocoder.go:101 cacheKey
    return f"{street}|{postal_code}|{city}"


def resolve_address(street: str, postal_code: str, city: str):
    """Synthetic Nominatim: returns (lat, lng) or None ("no results").
    Pure function of the cache key; the SQL twin lives in registry.py."""
    h = hashlib.md5(geocode_key(street, postal_code, city).encode("utf-8")).hexdigest()
    if int(h[16:18], 16) % GEOCODE_FAIL_MOD == 0:
        return None
    lat = 50.75 + (int(h[:8], 16) % 300000) / 100000.0
    lng = 3.2 + (int(h[8:16], 16) % 400000) / 100000.0
    return lat, lng


class GeocoderActor:
    """One shard of the geocode cache + logical rate budget.

    ``geocode_batch`` mirrors GeocodeAddress per key: hits are free;
    misses consume one logical second each (the Nominatim sleep,
    geocoder.go:124) — ``elapsed`` reports the budget a live run would
    have spent, keeping the politeness accounting without wall-clock."""

    def __init__(self):
        self.cache: dict[str, tuple | None] = {}
        self.hits = 0
        self.misses = 0
        self.elapsed = 0.0  # logical seconds spent on miss lookups

    def geocode_batch(self, keys: list[str], triples: list[tuple]) -> list:
        out = []
        for key, (street, postal, city) in zip(keys, triples):
            if key in self.cache:
                self.hits += 1
                out.append(self.cache[key])
                continue
            self.misses += 1
            self.elapsed += 1.0
            res = resolve_address(street, postal, city)
            self.cache[key] = res
            out.append(res)
        return out

    def stats(self) -> dict:
        return {
            "size": len(self.cache), "hits": self.hits,
            "misses": self.misses, "elapsed": self.elapsed,
        }

    def snapshot(self) -> dict:
        return dict(self.cache)

    def preload(self, cache: dict) -> int:
        self.cache.update(cache)
        return len(self.cache)


class GeocoderPool:
    """Sharded cache pool; shard = crc32(key) % n (same-address requests
    from any task land on one shard, so the once-ever budget holds)."""

    def __init__(self, num_shards: int = 2):
        import zlib as _z

        self._crc = _z.crc32
        Actor = ray.remote(num_cpus=0)(GeocoderActor)
        self.shards = [Actor.remote() for _ in range(num_shards)]

    def handles(self):
        return self.shards

    def stats(self) -> dict:
        stats = ray.get([s.stats.remote() for s in self.shards])
        return {
            k: sum(s[k] for s in stats) for k in ("size", "hits", "misses", "elapsed")
        }


BATCH_SIZE = 10  # database.go:644 batchSize


def update_missing_coordinates(store, pool: GeocoderPool):
    """database.go:620-759 as a streaming pass: eligible rows (missing
    coords, never attempted, full address) geocode through the actor pool
    in batches of 10; everything else passes through untouched."""
    import zlib

    shards = pool.handles()
    n_shards = len(shards)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        need = (
            (df["latitude"].isna() | df["longitude"].isna())
            & (pd.to_numeric(df["geocoding_attempted"], errors="coerce").fillna(0) == 0)
            & df["street"].notna() & df["postal_code"].notna() & df["city"].notna()
        )
        idx = df.index[need]
        if len(idx) == 0:
            return df
        keys = [
            geocode_key(df.at[i, "street"], df.at[i, "postal_code"], df.at[i, "city"])
            for i in idx
        ]
        triples = [
            (df.at[i, "street"], df.at[i, "postal_code"], df.at[i, "city"]) for i in idx
        ]
        # route per shard, submit in reference-sized batches of 10
        futs, slots = [], []
        by_shard: dict[int, list[int]] = {}
        for pos, k in enumerate(keys):
            by_shard.setdefault(zlib.crc32(k.encode()) % n_shards, []).append(pos)
        for s, positions in sorted(by_shard.items()):
            for lo in range(0, len(positions), BATCH_SIZE):
                chunk = positions[lo : lo + BATCH_SIZE]
                futs.append(
                    shards[s].geocode_batch.remote(
                        [keys[p] for p in chunk], [triples[p] for p in chunk]
                    )
                )
                slots.append(chunk)
        for chunk, res in zip(slots, ray.get(futs)):
            for p, coords in zip(chunk, res):
                i = idx[p]
                if coords is not None:
                    df.at[i, "latitude"] = coords[0]
                    df.at[i, "longitude"] = coords[1]
                df.at[i, "geocoding_attempted"] = 1
        return df

    return store.map_batches(fn, batch_format="pandas", batch_size=512)
