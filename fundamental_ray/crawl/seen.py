"""Sharded URL-seen set: cuckoo-filter accelerator over an exact store.

The reference keeps per-run ``processed_urls`` Python sets plus DB-loaded
URL sets (funda_spider.py:35,44-47,118-120) and relies on exact string
membership. The rebuild shards that state across an actor pool keyed by
``crc32(url_norm) % num_shards`` (SURVEY.md §2.4 D1/D2):

- a **cuckoo filter** (16-bit fingerprints, 4-way buckets) answers the hot
  path: "definitely new" needs no exact lookup — at crawl workloads the
  overwhelming majority of candidates are novel or duplicates, and the
  filter short-circuits the novel ones;
- an **exact tier** stays authoritative (north_rule requires the final seen
  *membership set* to match the reference exactly, so false positives must
  be double-checked). It is a hot in-memory set that PAGES TO DISK past a
  spill threshold (``ExactTier``: per-shard SQLite hash file — the 10^10
  design point: ~512 shards × ~20 M keys each can't all stay resident,
  while the ~2 bytes/key cuckoo filter (2.5 GB/shard-pool total) does).
  Disk lookups happen only on filter hits / degraded filters — the filter
  short-circuits the overwhelmingly common definitely-new case, so the
  disk tier is off the hot path by construction.

Claim semantics: ``check_and_insert`` is atomic per shard (actor serializes
calls), mirroring the reference's claim-before-request
(funda_spider.py:149-150). Membership is order-independent, so concurrent
batches from many tasks yield a deterministic final set.

Snapshots write the exact url list per shard to Parquet — the replayable
part of the round checkpoint (SURVEY.md §4.2).
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_EMPTY = 0
_SLOTS = 4
_MAX_KICKS = 500


def seen_claims_paths(rdir: str) -> list[str]:
    """Parquet files of one round's novel-claim checkpoint: the per-bucket
    parts dir (seen_claims/part-*.parquet, written by the politeness bucket
    tasks) and/or the legacy single seen_claims.parquet file."""
    import glob as _glob

    out = []
    legacy = os.path.join(rdir, "seen_claims.parquet")
    if os.path.exists(legacy):
        out.append(legacy)
    d = os.path.join(rdir, "seen_claims")
    if os.path.isdir(d):
        out.extend(sorted(_glob.glob(os.path.join(d, "*.parquet"))))
    return out


class CuckooFilter:
    """16-bit-fingerprint, 4-slot-bucket cuckoo filter (Fan et al., CoNEXT'14
    semantics; implemented from the public paper description)."""

    def __init__(self, capacity: int, seed: int = 0x5EED):
        n_buckets = 1
        while n_buckets * _SLOTS < capacity / 0.9:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        self.seed = seed
        self.count = 0
        self._rng_state = np.uint64(0x9E3779B97F4A7C15)
        # degradation tracking: once any insert fails (table at capacity or
        # a MAX_KICKS eviction chain gave up) a filter MISS no longer proves
        # novelty — the evicted victim's fingerprint would otherwise vanish.
        # The victim fp is kept in a stash consulted by contains(); degraded
        # tells callers to fall back to the exact tier on misses.
        self.degraded = False
        self.stash: set[int] = set()

    def _fp_and_index(self, key: bytes) -> tuple[int, int]:
        h = zlib.crc32(key, self.seed)
        fp = (h & 0xFFFF) or 1  # fingerprint 0 means empty slot
        i1 = (h >> 16) % self.n_buckets
        return fp, i1

    def _alt_index(self, i: int, fp: int) -> int:
        # partial-key cuckoo: alt = i XOR hash(fp)
        return (i ^ zlib.crc32(fp.to_bytes(2, "little"), 0x7777)) % self.n_buckets

    def contains(self, key: bytes) -> bool:
        fp, i1 = self._fp_and_index(key)
        if fp in self.stash:
            return True  # a failed eviction chain parked this fingerprint
        if (self.table[i1] == fp).any():
            return True
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i2] == fp).any())

    def insert(self, key: bytes) -> bool:
        fp, i1 = self._fp_and_index(key)
        for i in (i1, self._alt_index(i1, fp)):
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict: deterministic pseudo-random walk (xorshift, no wall clock)
        i = i1
        cur = fp
        for _ in range(_MAX_KICKS):
            self._rng_state ^= self._rng_state << np.uint64(13)
            self._rng_state ^= self._rng_state >> np.uint64(7)
            self._rng_state ^= self._rng_state << np.uint64(17)
            slot = int(self._rng_state) % _SLOTS
            cur, self.table[i, slot] = int(self.table[i, slot]), cur
            i = self._alt_index(i, cur)
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        # table full: keep the displaced victim fingerprint findable and
        # flip the shard to degraded mode (misses now consult the exact set)
        self.stash.add(cur)
        self.degraded = True
        return False


DEFAULT_SPILL = int(os.environ.get("FR_SEEN_SPILL", str(1_000_000)))


class ExactTier:
    """The authoritative membership store of one seen shard: a hot
    in-memory set that spills to a per-shard on-disk SQLite hash file
    (stdlib; the reference's own store is SQLite) once it crosses
    ``spill_threshold`` keys. Membership = hot set ∪ disk B-tree; the
    callers' filter-first discipline means lookups here are already rare.

    Contract: callers check membership BEFORE add() (check_and_insert,
    preload, _recover all do), so a key is never in both tiers and
    ``len`` is the plain sum."""

    def __init__(self, spill_threshold: int = DEFAULT_SPILL):
        self.threshold = max(1, spill_threshold)
        self.mem: set[str] = set()
        self._con = None
        self.n_disk = 0
        self._path = None

    def _disk(self):
        if self._con is None:
            import sqlite3
            import tempfile

            fd, self._path = tempfile.mkstemp(
                prefix="fr_seen_tier_", suffix=".sqlite", dir="/tmp"
            )
            os.close(fd)
            self._con = sqlite3.connect(self._path)
            self._con.execute(
                "CREATE TABLE IF NOT EXISTS seen (url TEXT PRIMARY KEY)"
            )
        return self._con

    def __contains__(self, u: str) -> bool:
        if u in self.mem:
            return True
        if self.n_disk:
            cur = self._con.execute("SELECT 1 FROM seen WHERE url = ?", (u,))
            return cur.fetchone() is not None
        return False

    def add(self, u: str) -> None:
        self.mem.add(u)
        if len(self.mem) >= self.threshold:
            self._spill()

    def _spill(self) -> None:
        con = self._disk()
        con.executemany(
            "INSERT OR IGNORE INTO seen (url) VALUES (?)",
            ((u,) for u in self.mem),
        )
        con.commit()
        self.n_disk = con.execute("SELECT COUNT(*) FROM seen").fetchone()[0]
        self.mem = set()

    def __len__(self) -> int:
        return len(self.mem) + self.n_disk

    def all_keys(self):
        """Full membership iteration (snapshot/test path only)."""
        out = list(self.mem)
        if self.n_disk:
            out.extend(
                u for (u,) in self._con.execute("SELECT url FROM seen")
            )
        return out


class SeenShardActor:
    """One shard of the URL-seen set. Instantiate via ray.remote(...).

    ``recovery`` enables actor-level fault tolerance on a real cluster:
    created with ``max_restarts``, a crashed shard re-runs ``__init__``
    with the same args and rebuilds its membership from the job's
    COMMITTED per-round claim checkpoints (round=*/seen_claims.parquet,
    filtered to this shard's hash slice of its status class). Claims of
    the in-flight round die with the actor — by design: they were never
    committed, the round replays idempotently, and membership claims are
    idempotent, so the final seen set is unchanged (the same guarantee the
    driver-level ``CrawlJob.resume`` gives after a driver crash)."""

    def __init__(
        self, shard_id: int, capacity: int = 1 << 20, recovery: dict | None = None,
        spill_threshold: int = 0,
    ):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity)
        self.spill_threshold = spill_threshold or DEFAULT_SPILL
        self.exact = ExactTier(self.spill_threshold)
        self.recovered = 0
        if recovery and os.path.isdir(recovery["job_dir"]):
            self.recovered = self._recover(**recovery)

    def _recover(self, job_dir: str, mode_class: str, num_shards: int) -> int:
        import glob as _glob

        n = 0
        for rdir in sorted(_glob.glob(os.path.join(job_dir, "round=*"))):
            if not os.path.exists(os.path.join(rdir, "_COMMITTED")):
                continue
            for p in seen_claims_paths(rdir):
                t = pq.read_table(p)
                is_sold = np.array(
                    [m == "sold" for m in t.column("mode").to_pylist()],
                    dtype=bool,
                )
                cls_mask = is_sold == (mode_class == "sold")
                for u in (
                    t.filter(pa.array(cls_mask)).column("url_norm").to_pylist()
                ):
                    if zlib.crc32(u.encode("utf-8")) % num_shards == self.shard_id:
                        if u not in self.exact:
                            self.exact.add(u)
                            self.filter.insert(u.encode("utf-8"))
                            n += 1
        return n

    def check_and_insert(self, urls: list[str]) -> list[bool]:
        """True = novel (now claimed). Atomic within the actor."""
        out = []
        for u in urls:
            key = u.encode("utf-8")
            if self.filter.contains(key) or self.filter.degraded:
                # filter hit — or a degraded filter whose misses are no
                # longer proof of novelty — the exact tier decides
                novel = u not in self.exact
            else:
                novel = True  # healthy filter miss → definitely new
            if novel:
                self.exact.add(u)
                self.filter.insert(key)  # failure flips degraded + stashes
            out.append(novel)
        return out

    def check_and_insert_arrow(self, table) -> "np.ndarray":
        """Arrow-batch claim: the url_norm column is decoded in the actor
        process, keeping the driver's per-URL python at zero."""
        return np.array(
            self.check_and_insert(table.column("url_norm").to_pylist()), dtype=bool
        )

    def claim_from_outputs(
        self,
        output_refs: list,
        mode_class: str,
        shard_id: int,
        num_shards: int,
        repush=None,
    ):
        """Pull-style round claim: read the candidate-extract task outputs
        straight from the object store (zero-copy plasma) and take THIS
        shard's pre-routed contiguous slice (the tasks sorted candidates by
        (class, shard) and shipped the slice offsets), claim it, and return
        only the novel request rows. One actor call per shard per round —
        candidate URLs never transit the driver, no per-task RPC fan-out,
        and no per-actor scan of the candidate stream.

        ``repush`` (a list of ObjectRefs of this shard's OWN novel-row
        tables from every not-yet-committed earlier round, or None) is
        resolved actor-side straight from plasma (the driver just hands the
        ObjectRefs back). Re-inserting is an idempotent no-op on a healthy
        shard, but closes the crash window where a shard dies AFTER
        returning a round's novel rows and restarts BEFORE that round
        commits: ``_recover`` replays only _COMMITTED rounds, so without
        the re-push a later round could claim those in-flight URLs twice
        (duplicate detail fetches + duplicate listing rows). With a
        pipeline_depth-W driver up to W rounds are uncommitted at once, so
        the re-push is a LIST — one table per uncommitted round."""
        import ray as _ray

        if repush:
            for t in _ray.get(list(repush)):
                if t is None:
                    continue
                for u in t.column("url_norm").to_pylist():
                    if u not in self.exact:
                        self.exact.add(u)
                        self.filter.insert(u.encode("utf-8"))
        route = shard_id + (num_shards if mode_class == "sold" else 0)
        tables = []
        for out in _ray.get(list(output_refs)):
            if out is None:
                continue
            offs = out["route_offsets"]
            lo, hi = int(offs[route]), int(offs[route + 1])
            if hi > lo:
                tables.append(out["cand"].slice(lo, hi - lo))
        if not tables:
            return None
        mine = pa.concat_tables(tables, promote_options="default")
        novel = np.array(
            self.check_and_insert(mine.column("url_norm").to_pylist()), dtype=bool
        )
        return mine.filter(pa.array(novel))

    def contains(self, urls: list[str]) -> list[bool]:
        out = []
        for u in urls:
            key = u.encode("utf-8")
            if self.filter.contains(key) or self.filter.degraded:
                out.append(u in self.exact)
            else:
                out.append(False)
        return out

    def preload(self, urls: list[str]) -> int:
        """Seed from a snapshot / DB-style seen source (S7). Idempotent:
        URLs already present (e.g. replayed by ``_recover`` before a
        resume-time preload of the same committed claims) are skipped so
        they don't consume a second filter slot — double-inserting every
        recovered URL would halve effective filter capacity and flip
        shards to degraded mode at half the intended scale."""
        for u in urls:
            if u not in self.exact:
                self.exact.add(u)
                self.filter.insert(u.encode("utf-8"))
        return len(self.exact)

    def size(self) -> int:
        return len(self.exact)

    def snapshot(self, path: str) -> int:
        tmp = path + ".tmp"
        pq.write_table(pa.table({"url": sorted(self.exact.all_keys())}), tmp)
        os.replace(tmp, path)
        return len(self.exact)

    def restore(self, path: str) -> int:
        urls = pq.read_table(path, columns=["url"]).column("url").to_pylist()
        self.filter = CuckooFilter(max(1 << 20, int(len(urls) / 0.8) + 1024))
        self.exact = ExactTier(self.spill_threshold)
        return self.preload(urls)


class SeenSet:
    """Driver-side facade over the shard actor pool.

    With ``recovery_base`` set, shards are created restartable
    (max_restarts/max_task_retries unbounded): a crashed shard replays
    its membership from the committed claim checkpoints under that job
    directory before serving its next call."""

    def __init__(
        self,
        num_shards: int = 8,
        capacity_per_shard: int = 1 << 20,
        recovery_base: str | None = None,
        mode_class: str = "active",
        spill_threshold: int = 0,
    ):
        import ray

        self.num_shards = num_shards
        # num_cpus=0: shards are latency-bound lookup actors active only
        # during the short claim phase; reserving CPU slots would steal task
        # capacity disproportionately at small cluster sizes (observed: at
        # num_cpus=2, four 0.25-cpu shards halved task throughput)
        Actor = ray.remote(num_cpus=0)(SeenShardActor)
        rec = None
        if recovery_base is not None:
            Actor = Actor.options(max_restarts=-1, max_task_retries=-1)
            rec = {
                "job_dir": recovery_base,
                "mode_class": mode_class,
                "num_shards": num_shards,
            }
        self.shards = [
            Actor.remote(i, capacity_per_shard, rec, spill_threshold)
            for i in range(num_shards)
        ]

    def _route(self, urls: list[str]) -> dict[int, list[int]]:
        by: dict[int, list[int]] = {}
        for idx, u in enumerate(urls):
            s = zlib.crc32(u.encode("utf-8")) % self.num_shards
            by.setdefault(s, []).append(idx)
        return by

    def check_and_insert(self, urls: list[str]) -> list[bool]:
        import ray

        out = [False] * len(urls)
        by = self._route(urls)
        futs = {
            s: self.shards[s].check_and_insert.remote([urls[i] for i in idxs])
            for s, idxs in by.items()
        }
        for s, idxs in by.items():
            for i, novel in zip(idxs, ray.get(futs[s])):
                out[i] = novel
        return out

    def contains(self, urls: list[str]) -> list[bool]:
        import ray

        out = [False] * len(urls)
        by = self._route(urls)
        futs = {
            s: self.shards[s].contains.remote([urls[i] for i in idxs])
            for s, idxs in by.items()
        }
        for s, idxs in by.items():
            for i, v in zip(idxs, ray.get(futs[s])):
                out[i] = v
        return out

    def preload(self, urls: list[str]) -> int:
        """Seed the pool from a snapshot / S7-style seen source."""
        import ray

        by = self._route(urls)
        return sum(
            ray.get(
                [
                    self.shards[s].preload.remote([urls[i] for i in idxs])
                    for s, idxs in by.items()
                ]
            )
        )

    def snapshot(self, dir_path: str) -> int:
        import ray

        os.makedirs(dir_path, exist_ok=True)
        return sum(
            ray.get(
                [
                    sh.snapshot.remote(os.path.join(dir_path, f"seen-shard-{i}.parquet"))
                    for i, sh in enumerate(self.shards)
                ]
            )
        )

    def restore(self, dir_path: str) -> int:
        import ray

        return sum(
            ray.get(
                [
                    sh.restore.remote(os.path.join(dir_path, f"seen-shard-{i}.parquet"))
                    for i, sh in enumerate(self.shards)
                ]
            )
        )

    def total(self) -> int:
        import ray

        return sum(ray.get([sh.size.remote() for sh in self.shards]))

    def all_urls(self) -> set[str]:
        """Test/checkpoint helper — materializes the full membership set.
        Driver-side only; never used in the hot path."""
        import ray

        out: set[str] = set()
        for i, sh in enumerate(self.shards):
            tmp = f"/tmp/fr_seen_dump_{os.getpid()}_{i}.parquet"
            ray.get(sh.snapshot.remote(tmp))
            out.update(pq.read_table(tmp).column("url").to_pylist())
            os.remove(tmp)
        return out


class StatusPartitionedSeen:
    """Status-partitioned URL-seen sets (SURVEY.md §1.2): the reference's
    active spider skips URLs already in {active, inactive, republished}
    (scrapers/funda/database.py:46-51) while the sold spider skips only
    {sold} (database.py:37-44) — two independent membership universes over
    the same URL space. One SeenSet pool per class; claims route by the
    requesting chain's mode, so an address can be claimed by the active
    crawl and *independently* by the sold crawl, exactly as two reference
    spider runs would both fetch it."""

    CLASSES = ("active", "sold")

    def __init__(
        self,
        num_shards: int = 8,
        capacity_per_shard: int = 1 << 20,
        recovery_base: str | None = None,
        spill_threshold: int = 0,
    ):
        self.num_shards = num_shards
        self.pools = {
            c: SeenSet(num_shards, capacity_per_shard, recovery_base, c,
                       spill_threshold)
            for c in self.CLASSES
        }

    def pool(self, mode: str) -> SeenSet:
        return self.pools["sold" if mode == "sold" else "active"]

    def preload(self, urls_by_class: dict[str, list[str]]) -> int:
        return sum(
            self.pools[c].preload(urls) for c, urls in urls_by_class.items() if urls
        )

    def preload_from_store(self, statuses_and_urls: list[tuple[str, str]]) -> int:
        """S7: seed from a property-store snapshot — the reference's
        status-dependent SELECTs. (status, url) pairs route: sold → sold
        class; active/inactive/republished → active class."""
        by: dict[str, list[str]] = {"active": [], "sold": []}
        for status, url in statuses_and_urls:
            if status == "sold":
                by["sold"].append(url)
            elif status in ("active", "inactive", "republished"):
                by["active"].append(url)
        return self.preload(by)

    def total(self) -> int:
        return sum(p.total() for p in self.pools.values())

    def all_urls(self) -> set[str]:
        out: set[str] = set()
        for p in self.pools.values():
            out |= p.all_urls()
        return out

    def all_urls_by_class(self) -> dict[str, set[str]]:
        return {c: p.all_urls() for c, p in self.pools.items()}
