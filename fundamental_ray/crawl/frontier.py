"""Frontier round driver — the crawl engine (SURVEY.md §3.1 / §7.2 stage 4).

One **round** is one BFS generation: every live chain fetches exactly one
list page (page p in round p — preserving the reference's sequential
pagination contract), candidate detail URLs are claimed against the sharded
seen set, politeness-budgeted, robots-gated, fetch-joined against the
bucketed pages index and extracted. Between rounds the driver folds the
reference's stop conditions (T3: 3 consecutive empty pages; 3 consecutive
no-new pages active / first no-new non-empty page sold —
funda_spider.py:127-145, funda_spider_sold.py:129-141) and commits a
checkpoint directory; a killed run resumes from the last _COMMITTED round.

Dataflow per round (html bytes never cross an exchange; candidate URLs
never transit the driver):

  list reqs ──fetch-join──> list pages ──extract tasks──> candidate tables
                                                          (object store)
     seen shards ──pull + claim own hash slice──> novel requests (small)
     (novel ∪ deferred) ──groupby(host) schedule──> scheduled | deferred
     scheduled ──robots gate──> fetchable ──fetch-join + extract──> listings Δ

The extract tasks pre-route candidates (sorted by (status class, shard)
with slice offsets), each seen shard actor pulls its ZERO-COPY slice of
every task output and claims it in ONE call per round, and the driver's
serial section folds per-page counters plus the politeness-bounded novel
set — O(pages + novel), independent of the candidate volume.

Politeness budget applies to detail fetches (list fetches are 1/chain/round
and implicitly within any budget); deferred requests persist as Parquet in
the round checkpoint, so resume restores them for free.
"""

from __future__ import annotations
from fundamental_ray.sources.parquet import read_parquet_clean

import json
import os
import time
from collections import deque
from dataclasses import asdict, dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..extraction.listing import LISTING_SCHEMA, extract_listing_row
from ..extraction.listpage import extract_listing_urls, extract_next_page, search_params_of
from ..extraction.selectolite import Selector
from .canonicalize import canonicalize_url, host_of
from .fetchstore import (
    fetch_map_tasks, plan_map_requests, submit_map_request_chunk,
)
from .politeness import DrainPlan, schedule_round, schedule_round_local
from .robots import RobotsTable
from .seen import StatusPartitionedSeen

REQUEST_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_norm", pa.string()),
        ("host", pa.string()),
        ("chain_id", pa.int64()),
        ("mode", pa.string()),
        ("place", pa.string()),
        ("priority", pa.int32()),
        ("page_seq", pa.int32()),
        ("url_crc", pa.uint32()),
        ("attempt", pa.int32()),  # fetch attempt counter (S4 retry sim)
    ]
)


@dataclass
class CrawlConfig:
    index_dir: str
    job_dir: str
    budget_per_host: int = 1_000
    num_seen_shards: int = 8
    obey_robots: bool = False  # reference parity: ROBOTSTXT_OBEY=False (settings.py:12)
    robots_rows: list = field(default_factory=list)  # [(host, body)]
    max_pages: int | None = None
    max_rounds: int = 64
    scraped_at: str = "1970-01-01T00:00:00"
    base_delay: float = 2.0
    # S4 retry simulation (settings.py:31-32: 5 retries on transient HTTP
    # codes): when on, detail requests whose url_norm is md5-flaky fail
    # with a synthetic 5xx/429 on their first attempt and are re-queued
    # (attempt+1) through the deferral path, succeeding next round. Pure
    # fault injection — final membership and listings are invariant.
    simulate_transient: bool = False
    transient_mod: int = 7  # flaky iff int(md5(url_norm)[:2],16) % mod == 0
    # post-discovery drain plan: once all chains are done, sort the
    # deferred backlog into service order ONCE and serve each round by
    # cursor advance (O(scheduled)/round) instead of re-sorting and
    # re-checkpointing the whole backlog (O(backlog)/round). Service sets
    # are round-for-round identical to the naive path (test-pinned);
    # False forces the naive scheduler (A/B + equivalence tests).
    drain_plan: bool = True
    # rounds whose detail fetch+extract may be in flight (uncommitted) at
    # once. 1 = classic one-round software pipeline; 2-3 lets the serial
    # list→claim→schedule path of several rounds run while earlier rounds'
    # detail task pools drain, which is what keeps 32 cores dense (the
    # detail pool is the bulk of the work but the driver otherwise blocks
    # on it once per round). Crash cost: resume replays ≤ depth+1 rounds
    # (idempotent — same mechanism as the classic 2-round replay).
    # Interleaved A/B at 32 cpus, 38,400 chains: depth 3 beat depth 1 in
    # all three adjacent pairs (70.0 vs 91.2 s, 66.2 vs 74.5, 72.2 vs
    # 73.5 — ~13% mean), identical listings/counters.
    pipeline_depth: int = 3


@dataclass
class ChainState:
    chain_id: int
    host: str
    place: str
    availability: str  # 'available' | 'unavailable'
    next_url: str
    page_no: int = 1
    empty_count: int = 0
    no_new_count: int = 0
    done: bool = False
    # canonical form of next_url, computed by the extract TASK that found
    # the next-page button (driver-side canonicalization of every live
    # chain per round is O(chains) serial python — measured 27 µs/url);
    # None → the driver canonicalizes lazily (seeds, constructed URLs,
    # resume from a pre-field checkpoint)
    next_url_norm: str | None = None

    @property
    def mode(self) -> str:
        return "active" if self.availability == "available" else "sold"


def extract_candidates_batch(batch: pa.Table, meta_ref, static_ref) -> dict:
    """Stateless task stage: fetched list pages → candidate request rows
    (full REQUEST_SCHEMA, pre-routed with ``url_crc``) + per-page visit
    counters. The candidate table stays in the OBJECT STORE: the seen-shard
    actors read it from plasma and claim their hash slice directly
    (``SeenShardActor.claim_from_outputs``) — candidate URLs never pass
    through the driver, whose per-round serial section folds only counters
    and the (politeness-bounded) novel set.

    Stateless tasks, not actors: the selector compile cache is
    worker-process-global, so warm across rounds without actor-pool
    spin-up (SURVEY.md §4.2: extractors are stateless tasks)."""
    import zlib

    import numpy as np

    pages = ray.get(meta_ref)  # url_norm -> (chain_id, page_seq), per round
    meta = ray.get(static_ref)  # job-static chain metadata (plasma, cached)
    mode_map = meta["mode"]  # chain_id -> 'active' | 'sold'
    place_map = meta["place"]

    out = {"chain_id": [], "page_seq": [], "url": [], "url_norm": [],
           "host": [], "url_crc": []}
    visits = {"chain_id": [], "page_seq": [], "found": [],
              "has_next": [], "next_url": [], "next_norm": []}

    for norm, url, html in zip(
        batch.column("url_norm").to_pylist(),
        batch.column("url").to_pylist(),
        batch.column("html").to_pylist(),
    ):
        chain_id, page_seq = pages[norm]
        sel = Selector(html.decode("utf-8", errors="replace"))
        found = 0
        for u in sorted(extract_listing_urls(sel, url)):
            n = canonicalize_url(u)
            out["chain_id"].append(chain_id)
            out["page_seq"].append(page_seq)
            out["url"].append(u)
            out["url_norm"].append(n)
            out["host"].append(host_of(u))
            out["url_crc"].append(zlib.crc32(n.encode("utf-8")))
            found += 1
        nxt = sel.css_get('a[data-test-id="next-page-button"]::attr(href)')
        next_url = extract_next_page(sel, url, {}, 0) if nxt else ""
        visits["chain_id"].append(chain_id)
        visits["page_seq"].append(page_seq)
        visits["found"].append(found)
        visits["has_next"].append(bool(nxt))
        visits["next_url"].append(next_url)
        visits["next_norm"].append(canonicalize_url(next_url) if nxt else "")

    cid_series = pd.Series(out["chain_id"], dtype="int64")
    cand = pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "url_norm": pa.array(out["url_norm"], pa.string()),
            "host": pa.array(out["host"], pa.string()),
            "chain_id": pa.array(cid_series, pa.int64()),
            "mode": pa.array(cid_series.map(mode_map), pa.string()),
            "place": pa.array(cid_series.map(place_map), pa.string()),
            "priority": pa.array(
                np.ones(len(out["url"]), dtype=np.int32), pa.int32()
            ),
            "page_seq": pa.array(out["page_seq"], pa.int32()),
            "url_crc": pa.array(
                np.asarray(out["url_crc"], dtype=np.int64).astype(np.uint32),
                pa.uint32(),
            ),
            "attempt": pa.array(
                np.zeros(len(out["url"]), dtype=np.int32), pa.int32()
            ),
        }
    ).cast(REQUEST_SCHEMA)
    # pre-route for the shard pull: sort by (class, shard) so each claim
    # actor takes its ZERO-COPY contiguous slice via the offsets table —
    # no per-actor scan of the candidate stream
    num_shards = meta["num_shards"]
    crc = np.asarray(out["url_crc"], dtype=np.int64)
    is_sold = cid_series.map(mode_map).to_numpy() == "sold"
    route = (crc % num_shards) + np.where(is_sold, num_shards, 0)
    order = np.argsort(route, kind="stable")
    cand = cand.take(pa.array(order))
    offsets = np.searchsorted(route[order], np.arange(2 * num_shards + 1))
    return {
        "cand": cand,
        "route_offsets": offsets,
        "visits": pa.table(
            {
                "chain_id": pa.array(visits["chain_id"], pa.int64()),
                "page_seq": pa.array(visits["page_seq"], pa.int32()),
                "found": pa.array(visits["found"], pa.int32()),
                "has_next": pa.array(visits["has_next"], pa.bool_()),
                "next_url": pa.array(visits["next_url"], pa.string()),
                "next_norm": pa.array(visits["next_norm"], pa.string()),
            }
        ),
    }


def extract_details_to_parts(
    batch: pa.Table, reqs: pa.Table, chunk_id: int, scraped_at: str, parts_dir: str
) -> dict:
    """Stateless task stage over fetched detail pages: listing rows or
    blocked drops (M3-M15). Writes its own Parquet part (deterministic name,
    atomic tmp+rename — re-runs overwrite) so listing bytes never transit
    the driver; returns only counters. ``reqs`` is the task's zero-copy
    request slice (url_norm → chain/mode/place)."""
    # iterate REQUEST rows (not fetched pages): the same page may be
    # requested by both an active and a sold chain (status-partitioned
    # crawls of one place) and must be parsed once per requesting mode
    page_map = {
        n: (u, h)
        for n, u, h in zip(
            batch.column("url_norm").to_pylist(),
            batch.column("url").to_pylist(),
            batch.column("html").to_pylist(),
        )
    }
    rows = []
    chain_ids = []
    blocked_n = 0
    fetched_n = 0
    for norm, chain_id, mode, place in zip(
        reqs.column("url_norm").to_pylist(),
        reqs.column("chain_id").to_pylist(),
        reqs.column("mode").to_pylist(),
        reqs.column("place").to_pylist(),
    ):
        page = page_map.get(norm)
        if page is None:
            continue  # fetch miss (live 404)
        fetched_n += 1
        url, html = page
        row = extract_listing_row(
            html.decode("utf-8", errors="replace"),
            url, place, mode=mode, scraped_at=scraped_at,
        )
        if row is None:
            blocked_n += 1
        else:
            rows.append(row)
            chain_ids.append(chain_id)
    n_listings = len(rows)
    if n_listings:
        cols = {n: [r.get(n) for r in rows] for n in [f.name for f in LISTING_SCHEMA]}
        t = pa.Table.from_pydict(cols, schema=LISTING_SCHEMA)
        t = t.append_column("chain_id", pa.array(chain_ids, pa.int64()))
        path = os.path.join(parts_dir, f"part-{chunk_id:05d}.parquet")
        pq.write_table(t, path + ".tmp")
        os.replace(path + ".tmp", path)
    return {"fetched": fetched_n, "blocked": blocked_n, "listings": n_listings}


class CrawlJob:
    def __init__(
        self, config: CrawlConfig, chains: list[ChainState], _resuming: bool = False
    ):
        # A FRESH job over a job_dir holding a previous run's committed
        # rounds would silently replay that run's seen claims (the shards
        # recover whenever committed checkpoints exist) — deduping
        # everything and emitting zero listings with no warning. Fail fast;
        # continuation goes through CrawlJob.resume().
        if not _resuming and os.path.isdir(config.job_dir):
            import glob as _glob

            stale = _glob.glob(
                os.path.join(config.job_dir, "round=*", "_COMMITTED")
            )
            if stale:
                raise ValueError(
                    f"job_dir {config.job_dir} already holds {len(stale)} "
                    "committed round(s); use CrawlJob.resume(config) to "
                    "continue it, or clear the directory for a fresh run"
                )
        self.cfg = config
        self.chains = {c.chain_id: c for c in chains}
        # shards are restartable: a crashed shard replays its slice of the
        # committed per-round claim checkpoints (actor-level analogue of
        # the driver's resume(); the in-flight round is covered by the
        # next round's claim re-push — see claim_from_outputs)
        self.seen = StatusPartitionedSeen(
            config.num_seen_shards, recovery_base=config.job_dir
        )
        self.robots = RobotsTable.from_rows(config.robots_rows)
        self.round = 0
        self._static_meta_ref = None  # job-static chain metadata, put once
        # (class, shard) -> [(round, ObjectRef of that shard's claim
        # output)] for every round not yet committed, handed back on the
        # next claim call as the crash-window re-push; pruned at commit
        self._unc_claim_refs: dict = {}
        self._round_novel: pa.Table = REQUEST_SCHEMA.empty_table()
        self._drain: DrainPlan | None = None  # post-discovery backlog plan
        self._drain_backlog_path: str | None = None
        self.lineage: list[dict] = []
        self.counters: dict[str, int] = {
            "fetched": 0, "deduped": 0, "deferred": 0, "robots_denied": 0,
            "blocked": 0, "fetch_miss": 0, "listings": 0, "retried": 0,
        }
        os.makedirs(config.job_dir, exist_ok=True)

    # ---------------------------------------------------------------- utils
    def _round_dir(self, r: int) -> str:
        return os.path.join(self.cfg.job_dir, f"round={r:04d}")

    def _lineage(self, stage: str, in_rows: int, out_rows: int, t0: float, **extra):
        self.lineage.append(
            {
                "round": self.round, "stage": stage, "in_rows": in_rows,
                "out_rows": out_rows, "wall_ms": int((time.time() - t0) * 1000),
                **extra,
            }
        )

    def _empty_requests(self) -> pa.Table:
        return REQUEST_SCHEMA.empty_table()

    # ---------------------------------------------------------------- round
    def run(self, deferred: pa.Table | None = None) -> dict:
        """Run to completion (or max_rounds); returns final cumulative
        counters. Pass the deferred table from ``resume()`` to continue a
        checkpointed job.

        Rounds are software-pipelined: round r's detail fetch+extract tasks
        run while the list phases of rounds r+1 … r+pipeline_depth execute;
        commits lag up to pipeline_depth rounds but stay in round order.
        Resume semantics are unchanged — chain states are snapshotted at the
        end of round r's stop fold (before round r+1 mutates anything) and
        counters are folded per-round deltas, so a crash mid-pipeline just
        replays at most pipeline_depth+1 idempotent rounds."""
        if deferred is None:
            deferred = self._empty_requests()
        depth = max(1, self.cfg.pipeline_depth)
        pending: deque = deque()  # oldest-first; all but the newest have
        # their detail tasks launched (by the next round's _phase_a)
        while self.round < self.cfg.max_rounds:
            live = [c for c in self.chains.values() if not c.done]
            if (
                not live
                and deferred.num_rows == 0
                and (self._drain is None or self._drain.remaining == 0)
            ):
                break
            self.round += 1
            pend = self._phase_a(
                live, deferred, launch_after=pending[-1] if pending else None
            )
            deferred = pend["new_deferred"]
            pending.append(pend)
            while len(pending) > depth:  # commit in round order, lagging
                self._collect_commit(pending.popleft())
        if pending:
            self._launch_details(pending[-1])  # final round: no next round
            while pending:
                self._collect_commit(pending.popleft())
        return dict(self.counters)

    def _phase_a(
        self, live: list[ChainState], deferred: pa.Table, launch_after: dict | None = None
    ) -> dict:
        """List fetch+extract → dedup claim → politeness → robots →
        stop-condition fold → state snapshot. Everything the next round
        depends on happens here.

        ``launch_after`` is the PREVIOUS round's pend dict: its (bulk)
        detail fetch tasks are launched only after THIS round's list tasks
        and claim pulls are already in the scheduler queue. Submission
        order is the only priority lever Ray tasks have, and the list →
        claim → schedule path is the per-round critical path — without the
        reorder, a round's ~1-2 s of list parsing queues behind the
        previous round's ~10 s of detail extraction and the list phase
        stops scaling with cores (measured 43 s → 48 s from 8 → 32 cpus
        at 38,400 chains)."""
        cfg = self.cfg
        rdir = self._round_dir(self.round)
        os.makedirs(rdir, exist_ok=True)
        delta = {
            "fetched": 0, "deduped": 0, "deferred": 0, "robots_denied": 0,
            "blocked": 0, "fetch_miss": 0, "listings": 0, "retried": 0,
        }

        # -- 1+2. list fetch + extraction + shard-pull dedup claim ------
        # extract tasks park their candidate tables in the object store;
        # every seen shard then pulls ALL outputs (zero-copy plasma reads),
        # claims its hash slice of its status class, and returns only its
        # novel rows — ONE actor call per shard per round, no per-task RPC
        # fan-out, and candidate URLs never transit the driver. The
        # driver's serial section folds per-page counters + concatenates
        # the (politeness-bounded) novel set.
        page_visits: dict[int, dict] = {
            c.chain_id: {"found": 0, "new": 0, "has_next": False, "visited": False}
            for c in live
        }
        novel_t = self._empty_requests()
        n_candidates = 0
        if live:
            t0 = time.time()
            # chain metadata is static for the job's lifetime — shipped to
            # plasma ONCE; only the per-round page map is rebuilt (the
            # per-round driver serial section must stay O(live pages))
            if self._static_meta_ref is None:
                self._static_meta_ref = ray.put(
                    {
                        "mode": {cid: c.mode for cid, c in self.chains.items()},
                        "place": {cid: c.place for cid, c in self.chains.items()},
                        "num_shards": self.seen.num_shards,
                    }
                )
            pages = {
                (c.next_url_norm or canonicalize_url(c.next_url)):
                    (c.chain_id, c.page_no)
                for c in live
            }
            meta_ref = ray.put(pages)
            # chunking: ≥2 list-fetch tasks per CPU balances load, but every
            # claim actor pulls EVERY task's output, so the round's pull
            # fan-in is n_tasks × n_claim_actors — cap it (measured: at 32
            # cpus halving the task count cut the round wall ~12%)
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            n_claims = 2 * self.seen.num_shards
            waves = 2 if 2 * ncpu * n_claims <= 1024 else 1
            chunk = max(32, len(pages) // (waves * ncpu) + 1)
            t_launch = time.time()
            refs = fetch_map_tasks(
                cfg.index_dir, list(pages), "list",
                extract_candidates_batch,
                {"meta_ref": meta_ref, "static_ref": self._static_meta_ref},
                max_urls_per_task=chunk,
            )
            # dispatch the shard pulls immediately — the actors block on the
            # extract outputs themselves, overlapping the driver's own fold.
            # Each call also hands the shard its own claim-output refs for
            # every round not yet committed (resolved actor-side from
            # plasma): the idempotent re-push closes the die-after-return /
            # restart-before-commit duplicate-claim window for the whole
            # pipeline_depth window (see SeenShardActor.claim_from_outputs;
            # _collect_commit prunes refs as rounds commit)
            claim_futs = []
            for cls, pool in self.seen.pools.items():
                for k, shard in enumerate(pool.shards):
                    unc = self._unc_claim_refs.setdefault((cls, k), [])
                    fut = shard.claim_from_outputs.remote(
                        refs, cls, k, self.seen.num_shards,
                        [r for _, r in unc] or None,
                    )
                    claim_futs.append(fut)
                    unc.append((self.round, fut))
            # this round's critical-path tasks are queued — NOW release the
            # previous round's bulk detail work behind them
            self._launch_details(launch_after)
            t_dispatch = time.time()
            results = [r for r in ray.get(refs) if r is not None]
            t_extract = time.time()
            # counter fold (visits are one small row per parsed page)
            for r in results:
                v = r["visits"]
                for cid, found, has_next, nxt, nnorm in zip(
                    v.column("chain_id").to_pylist(),
                    v.column("found").to_pylist(),
                    v.column("has_next").to_pylist(),
                    v.column("next_url").to_pylist(),
                    v.column("next_norm").to_pylist(),
                ):
                    pv = page_visits[cid]
                    pv["visited"] = True
                    pv["found"] = found
                    if has_next and not pv["has_next"]:
                        pv["has_next"] = True
                        pv["next_url"] = nxt
                        pv["next_norm"] = nnorm
                n_candidates += int(pc.sum(v.column("found")).as_py() or 0)
            t_fold = time.time()
            novel_tables = [
                t for t in ray.get(claim_futs) if t is not None and t.num_rows
            ]
            t_claim = time.time()
            if novel_tables:
                novel_t = pa.concat_tables(novel_tables, promote_options="default")
            # per-chain 'new' counts — tiny vectorized groupby over novels
            if novel_t.num_rows:
                newc = novel_t.group_by("chain_id").aggregate([("chain_id", "count")])
                for cid, n in zip(
                    newc.column("chain_id").to_pylist(),
                    newc.column("chain_id_count").to_pylist(),
                ):
                    if cid in page_visits:
                        page_visits[cid]["new"] = n
            delta["deduped"] = n_candidates - novel_t.num_rows
            self._lineage(
                "list_extract_claim", len(live), novel_t.num_rows, t0,
                deduped=delta["deduped"], candidates=n_candidates,
                meta_ms=int((t_launch - t0) * 1000),
                launch_ms=int((t_dispatch - t_launch) * 1000),
                extract_ms=int((t_extract - t_dispatch) * 1000),
                fold_ms=int((t_fold - t_extract) * 1000),
                claim_ms=int((t_claim - t_fold) * 1000),
            )

        if not live:
            # deferred-only round: no list tasks to prioritize
            self._launch_details(launch_after)

        # -- 3. politeness schedule over novel ∪ deferred ---------------
        t0 = time.time()
        drain_round = False
        if (
            not live and self._drain is None
            and deferred.num_rows and cfg.drain_plan
        ):
            # every chain is done: no new request can ever enter the
            # frontier, so the backlog is a FIXED set served in fixed
            # per-host slices. Sort it into service order once (DrainPlan)
            # and checkpoint the sorted backlog once; each remaining round
            # is then an O(scheduled) cursor advance instead of an
            # O(backlog) re-sort + re-write (the 92.4M-row deferral storm
            # of the 76,800-chain polite bench).
            delays = {
                h: d for h in set(deferred.column("host").to_pylist())
                if (d := self.robots.crawl_delay(h)) is not None
            } if cfg.obey_robots else {}
            self._drain = DrainPlan(
                deferred, cfg.budget_per_host, delays, cfg.base_delay
            )
            self._drain_backlog_path = os.path.join(
                self.cfg.job_dir, f"drain_backlog-r{self.round:04d}.parquet"
            )
            pq.write_table(self._drain.table, self._drain_backlog_path)
            self._lineage(
                "drain_plan", deferred.num_rows, self._drain.table.num_rows, t0
            )
            t0 = time.time()
        if self._drain is not None:
            drain_round = True
            pending_rows = self._drain.remaining
            scheduled, remaining = self._drain.next_round()
            new_deferred = self._empty_requests()
            delta["deferred"] = remaining
            self._lineage(
                "politeness", pending_rows, scheduled.num_rows, t0,
                deferred=remaining, drain=1,
            )
        else:
            pending = pa.concat_tables(
                [deferred, novel_t], promote_options="default"
            )
            t_concat = time.time()
            scheduled, new_deferred = self._empty_requests(), self._empty_requests()
            if pending.num_rows:
                delays = {
                    h: d for h in set(pending.column("host").to_pylist())
                    if (d := self.robots.crawl_delay(h)) is not None
                } if cfg.obey_robots else {}
                # fast path: when no host exceeds its budget the schedule is the
                # identity — detect with a vectorized value_counts and skip the
                # groupby-host exchange entirely (common at generous budgets)
                over = False
                for s in pending.column("host").value_counts():
                    host = s["values"].as_py()
                    budget = cfg.budget_per_host
                    d = delays.get(host)
                    if d and d > cfg.base_delay:
                        budget = max(1, int(budget * cfg.base_delay / d))
                    if s["counts"].as_py() > budget:
                        over = True
                        break
                if not over:
                    scheduled = pending
                elif pending.num_rows < 2_000_000:
                    # vectorized driver-local schedule (identical semantics);
                    # pending is budget-bounded per round, so this is the
                    # common case even at huge frontier scale
                    scheduled, new_deferred = schedule_round_local(
                        pending, cfg.budget_per_host, delays, cfg.base_delay
                    )
                    scheduled = scheduled.select(REQUEST_SCHEMA.names)
                    new_deferred = new_deferred.select(REQUEST_SCHEMA.names)
                else:
                    scheduled_ds = schedule_round(
                        ray.data.from_arrow(pending), cfg.budget_per_host, delays,
                        cfg.base_delay,
                    )
                    sched_t = pa.concat_tables(
                        [ray.get(r) for r in scheduled_ds.to_arrow_refs()],
                        promote_options="default",
                    )
                    mask = sched_t.column("scheduled")
                    scheduled = sched_t.filter(mask).drop_columns(
                        ["scheduled"]
                    ).select(REQUEST_SCHEMA.names)
                    new_deferred = sched_t.filter(pc.invert(mask)).drop_columns(
                        ["scheduled"]
                    ).select(REQUEST_SCHEMA.names)
            delta["deferred"] = new_deferred.num_rows
            self._lineage("politeness", pending.num_rows, scheduled.num_rows, t0,
                          deferred=new_deferred.num_rows,
                          concat_ms=int((t_concat - t0) * 1000))

        # -- 4. robots gate (vectorized: host-level lookup + numpy prefix
        # masks; only hosts that actually have rules cost per-row work) --
        if cfg.obey_robots and scheduled.num_rows:
            t0 = time.time()
            allowed_mask = pa.array(
                self.robots.allowed_mask(
                    scheduled.column("host").to_numpy(zero_copy_only=False),
                    scheduled.column("url").to_numpy(zero_copy_only=False),
                )
            )
            denied = scheduled.filter(pc.invert(allowed_mask))
            scheduled = scheduled.filter(allowed_mask)
            delta["robots_denied"] = denied.num_rows
            self._lineage("robots", scheduled.num_rows + denied.num_rows,
                          scheduled.num_rows, t0, robots_denied=denied.num_rows)

        # -- 4b. transient-retry simulation (S4, settings.py:31-32) -----
        # first-attempt requests of md5-flaky urls "fail with a 5xx/429":
        # they consumed their politeness slot (as a real failed GET would),
        # are counted `retried`, and re-ride the deferral path with
        # attempt+1 — succeeding on the next round's wave.
        if cfg.simulate_transient and scheduled.num_rows:
            import hashlib as _hl

            t0 = time.time()
            # opt-in fault injection: md5 per scheduled row (politeness-
            # bounded), matching the DuckDB-recomputable flakiness rule
            flaky = np.array(
                [
                    int(_hl.md5(u.encode("utf-8")).hexdigest()[:2], 16)
                    % cfg.transient_mod == 0
                    for u in scheduled.column("url_norm").to_pylist()
                ],
                dtype=bool,
            )
            first = pc.equal(scheduled.column("attempt"), 0).to_numpy(
                zero_copy_only=False
            )
            fail = pa.array(flaky & first)
            retry_rows = scheduled.filter(fail)
            scheduled = scheduled.filter(pc.invert(fail))
            if retry_rows.num_rows:
                retry_rows = retry_rows.set_column(
                    retry_rows.schema.get_field_index("attempt"),
                    "attempt",
                    pc.add(retry_rows.column("attempt"), 1).cast(pa.int32()),
                )
                if drain_round:
                    # retries re-enter at the FRONT of their host's next
                    # budget — their service keys precede everything still
                    # behind the cursor, so this equals the re-sort path
                    self._drain.push_extras(
                        retry_rows.select(REQUEST_SCHEMA.names)
                    )
                else:
                    new_deferred = pa.concat_tables(
                        [new_deferred, retry_rows], promote_options="default"
                    ).select(REQUEST_SCHEMA.names)
            delta["retried"] = retry_rows.num_rows
            self._lineage("transient_retry", scheduled.num_rows + retry_rows.num_rows,
                          scheduled.num_rows, t0, retried=retry_rows.num_rows)

        # -- 5a. detail fetch-join + extraction: NOT launched here — the
        # NEXT round's _phase_a launches it right after its own list tasks
        # and claim pulls are queued (run() launches the final round's).
        # Request metadata travels as ONE arrow table in plasma (zero-copy
        # slices per chunk task); listing parts are written by the tasks
        # themselves, so listing bytes never pass through the driver.

        # -- 6. stop-condition fold (reference control flow) ------------
        for c in live:
            pv = page_visits[c.chain_id]
            if not pv["visited"]:
                # list page absent from the pages table → the live crawl's
                # request would 404 → chain ends
                c.done = True
                continue
            found, new = pv["found"], pv["new"]
            if found == 0:
                c.empty_count += 1
                if c.empty_count >= 3:
                    c.done = True
                    continue
            else:
                c.empty_count = 0
            if c.mode == "sold":
                if new == 0 and found > 0:
                    c.done = True
                    continue
            else:
                if new == 0:
                    c.no_new_count += 1
                    if c.no_new_count >= 3:
                        c.done = True
                        continue
                else:
                    c.no_new_count = 0
            if cfg.max_pages is not None and c.page_no >= cfg.max_pages:
                c.done = True
                continue
            # pagination: button href, else manual construction (M2)
            if pv.get("has_next"):
                c.next_url = pv["next_url"]
                c.next_url_norm = pv.get("next_norm") or None
            else:
                params = search_params_of(c.next_url)
                params.pop("page", None)
                params["page"] = str(c.page_no + 1)
                from urllib.parse import urlencode, urlsplit, urlunsplit

                s = urlsplit(c.next_url)
                c.next_url = urlunsplit(
                    (s.scheme, s.netloc, s.path, urlencode(params), "")
                )
                c.next_url_norm = None  # canonicalized lazily next round
            c.page_no += 1

        drain_snap = None
        if drain_round:
            d = self._drain
            drain_snap = {
                "backlog_path": self._drain_backlog_path,
                "cursors": [int(x) for x in d.cursors],
                "ends": [int(x) for x in d.ends],
                "extras": d.extras,
            }
        return {
            "round": self.round, "rdir": rdir, "page_visits": page_visits,
            "drain": drain_snap,
            "new_deferred": new_deferred, "novel": novel_t, "refs": [],
            "scheduled": scheduled, "detail_launched": False,
            "scheduled_rows": scheduled.num_rows, "delta": delta,
            "chains_json": [asdict(c) for c in self.chains.values()],
            "t_fetch_launch": time.time(),
        }

    def _launch_details(self, pend: dict | None) -> None:
        """Launch a round's detail fetch+extract tasks (idempotent).

        Submission is EAGER (all chunks at once). Two throttled variants
        were A/B'd at 38,400 chains / 32 cpus and rejected: a zero-cpu
        pacing actor and a driver-side window pumped from inside the
        driver's waits (FIFO chunk queue, 2×ncpu in flight). Both cut the
        measured list-extract wait, but the wall got WORSE or stayed flat
        (eager 78.7/81.5 s vs windowed 91.4/83.8 s interleaved) because at
        this point the run is work-bound: the cores a list task waits for
        are doing useful detail extraction, and any window starves them
        during the driver's serial sections. See BASELINE.md round-3
        negative results."""
        if pend is None or pend["detail_launched"]:
            return
        pend["detail_launched"] = True
        scheduled = pend.pop("scheduled")
        if scheduled.num_rows:
            import shutil as _sh

            parts_dir = os.path.join(pend["rdir"], "listings_parts")
            _sh.rmtree(parts_dir, ignore_errors=True)  # re-run safety
            os.makedirs(parts_dir, exist_ok=True)
            # adaptive chunk size: big rounds want FEWER, larger tasks
            # (each task pays a bucket-dataset open + one isin-filtered
            # read; interleaved A/B at 38,400 chains / 32 cpus: 1536-row
            # chunks beat 512 in every pair, 59.6 vs 72.7 s best — and
            # 3072 ≈ 1536, so the curve is flat past ~1.5k); small rounds
            # keep 512 so every core still gets work (2400-chain rounds
            # schedule ~16k rows → 32 tasks).
            ncpu_ = int(ray.cluster_resources().get("CPU", 8))
            chunk_rows = int(os.environ.get("FR_DETAIL_CHUNK", "0")) or min(
                2048, max(512, scheduled.num_rows // (4 * ncpu_))
            )
            table_ref, chunks = plan_map_requests(
                self.cfg.index_dir, scheduled, "detail",
                max_urls_per_task=chunk_rows,
            )
            fn_kwargs = {
                "scraped_at": self.cfg.scraped_at, "parts_dir": parts_dir,
            }
            pend["refs"] = [
                submit_map_request_chunk(
                    table_ref, c, i, extract_details_to_parts, fn_kwargs
                )
                for i, c in enumerate(chunks)
            ]
        pend["t_fetch_launch"] = time.time()

    # ------------------------------------------------------------ commit
    def _collect_commit(self, pend: dict) -> None:
        """Barrier on the round's detail tasks (mostly complete by now —
        they overlapped the next round's list phase), fold fetch counters,
        write the checkpoint."""
        delta = pend["delta"]
        if pend["refs"]:
            counts = [c for c in ray.get(pend["refs"]) if c is not None]
            delta["fetched"] = sum(c["fetched"] for c in counts)
            delta["blocked"] = sum(c["blocked"] for c in counts)
            delta["listings"] = sum(c["listings"] for c in counts)
            delta["fetch_miss"] = pend["scheduled_rows"] - delta["fetched"]
            self.lineage.append(
                {
                    "round": pend["round"], "stage": "fetch_extract",
                    "in_rows": pend["scheduled_rows"],
                    "out_rows": delta["listings"],
                    "wall_ms": int((time.time() - pend["t_fetch_launch"]) * 1000),
                    "fetched": delta["fetched"],
                }
            )
        for k, v in delta.items():
            self.counters[k] = self.counters.get(k, 0) + v

        rdir = pend["rdir"]
        if pend.get("drain"):
            # drain-phase checkpoint: the sorted backlog was written ONCE
            # at plan build; per round only the per-host cursors (tiny) and
            # the retry overlay (tiny) hit disk — O(1) instead of
            # O(backlog) deferred.parquet rewrites
            snap = pend["drain"]
            ex = snap["extras"]
            pq.write_table(
                ex if ex is not None else REQUEST_SCHEMA.empty_table(),
                os.path.join(rdir, "drain_extras.parquet"),
            )
            with open(os.path.join(rdir, "drain_cursor.json"), "w") as fh:
                json.dump(
                    {
                        "backlog": snap["backlog_path"],
                        "cursors": snap["cursors"],
                        "ends": snap["ends"],
                    },
                    fh,
                )
        else:
            pq.write_table(
                pend["new_deferred"], os.path.join(rdir, "deferred.parquet")
            )
        # incremental seen snapshot: just this round's claims (O(Δ), not
        # O(total)); resume unions all committed rounds' claim files
        pq.write_table(
            pend["novel"].select(["url_norm", "mode"]),
            os.path.join(rdir, "seen_claims.parquet"),
        )
        with open(os.path.join(rdir, "chains.json"), "w") as fh:
            json.dump(pend["chains_json"], fh)
        with open(os.path.join(rdir, "counters.json"), "w") as fh:
            json.dump(
                {
                    "round": pend["round"], "counters": self.counters,
                    "page_visits": {
                        str(k): {
                            kk: vv for kk, vv in v.items()
                            if kk not in ("next_url", "next_norm")
                        }
                        for k, v in pend["page_visits"].items()
                    },
                },
                fh,
            )
        with open(os.path.join(rdir, "lineage.jsonl"), "w") as fh:
            for rec in self.lineage:
                if rec["round"] == pend["round"]:
                    fh.write(json.dumps(rec) + "\n")
        with open(os.path.join(rdir, "_COMMITTED"), "w") as fh:
            fh.write("ok")
        # committed rounds no longer need the crash-window claim re-push
        for key, lst in self._unc_claim_refs.items():
            self._unc_claim_refs[key] = [
                (rnd, r) for rnd, r in lst if rnd > pend["round"]
            ]

    # ------------------------------------------------------------ resume
    @classmethod
    def resume(cls, config: CrawlConfig) -> tuple["CrawlJob", pa.Table]:
        """Restore from the latest _COMMITTED round of config.job_dir."""
        rounds = sorted(
            int(d.split("=")[1])
            for d in os.listdir(config.job_dir)
            if d.startswith("round=")
            and os.path.exists(os.path.join(config.job_dir, d, "_COMMITTED"))
        )
        if not rounds:
            raise FileNotFoundError("no committed round to resume from")
        last = rounds[-1]
        rdir = os.path.join(config.job_dir, f"round={last:04d}")
        with open(os.path.join(rdir, "chains.json")) as fh:
            chains = [ChainState(**c) for c in json.load(fh)]
        job = cls(config, chains, _resuming=True)
        job.round = last
        by_class: dict[str, list[str]] = {"active": [], "sold": []}
        for r in rounds:
            p = os.path.join(config.job_dir, f"round={r:04d}", "seen_claims.parquet")
            if os.path.exists(p):
                t = pq.read_table(p)
                sold_mask = pc.equal(t.column("mode"), "sold")
                by_class["sold"].extend(
                    t.filter(sold_mask).column("url_norm").to_pylist()
                )
                by_class["active"].extend(
                    t.filter(pc.invert(sold_mask)).column("url_norm").to_pylist()
                )
        job.seen.preload(by_class)
        with open(os.path.join(rdir, "counters.json")) as fh:
            job.counters = {"retried": 0, **json.load(fh)["counters"]}
        dc = os.path.join(rdir, "drain_cursor.json")
        if os.path.exists(dc):
            with open(dc) as fh:
                snap = json.load(fh)
            backlog = pq.read_table(snap["backlog"])
            ranges = [
                np.arange(a, b)
                for a, b in zip(snap["cursors"], snap["ends"]) if b > a
            ]
            rem = (
                backlog.take(pa.array(np.concatenate(ranges), pa.int64()))
                if ranges else backlog.slice(0, 0)
            )
            extras = pq.read_table(os.path.join(rdir, "drain_extras.parquet"))
            deferred = pa.concat_tables(
                [extras, rem], promote_options="default"
            )
        else:
            deferred = pq.read_table(os.path.join(rdir, "deferred.parquet"))
        if "attempt" not in deferred.column_names:  # pre-retry-sim layout
            deferred = deferred.append_column(
                "attempt", pa.array(np.zeros(deferred.num_rows, dtype=np.int32))
            )
        deferred = deferred.select(REQUEST_SCHEMA.names)
        return job, deferred

def chains_from_corpus(corpus_chains) -> list[ChainState]:
    """Seed ChainStates from synth corpus Chain objects (S1/S10)."""
    from ..extraction.listpage import build_search_url

    return [
        ChainState(
            chain_id=c.chain_id, host=c.host, place=c.place,
            availability=c.availability,
            next_url=build_search_url(c.host, c.place, c.availability),
        )
        for c in corpus_chains
    ]


def round_listings_paths(job_dir: str) -> list[str]:
    """Parquet part files of every committed round's listings delta."""
    import glob as _glob

    paths: list[str] = []
    for d in sorted(os.listdir(job_dir)):
        if not d.startswith("round="):
            continue
        rdir = os.path.join(job_dir, d)
        if not os.path.exists(os.path.join(rdir, "_COMMITTED")):
            continue
        paths.extend(sorted(_glob.glob(os.path.join(rdir, "listings_parts", "*.parquet"))))
        legacy = os.path.join(rdir, "listings.parquet")
        if os.path.exists(legacy):
            paths.append(legacy)
    return paths


def crawl_listings_dataset(job_dir: str) -> ray.data.Dataset:
    """Union of all committed per-round listing deltas. The hive-style
    ``round=NNNN`` checkpoint directories would otherwise surface as an
    inferred partition column — the round is checkpoint lineage, not a
    listing field, so it is dropped here."""
    ds = read_parquet_clean(round_listings_paths(job_dir))
    if "round" in ds.schema().names:
        ds = ds.drop_columns(["round"])
    return ds
