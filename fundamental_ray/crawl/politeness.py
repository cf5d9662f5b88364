"""Per-host politeness scheduling — the groupby-host + sort-by-priority
shuffle of the north rule.

The reference's live throttle (2 req/domain, 2 s delay, AutoThrottle,
settings.py:15-28) maps to a per-round token budget per host: a round is a
time slice; ``budget ≈ slice_seconds / effective_delay``. Requests beyond
the budget are **deferred** (re-queued next round, counter
``deferred-for-politeness``), preserving the reference's ordering contract
(SURVEY.md §3.1): within a host, requests are served in
``(priority, page_seq, url_crc, url_norm)`` order — the crc tiebreak keeps
the budget-boundary cut integer-sorted (url_norm breaks the rare exact crc
collision, so the order stays fully deterministic).

Implementation: ``groupby("host").map_groups(schedule)`` — one task per
host group; a Zipf-hot host costs one larger group here (cheap: just a sort
+ head) while the CPU-heavy fetch/extract stages stay hash(url)-partitioned
and therefore salted across the cluster (SURVEY.md §4.2 skew note).
"""

from __future__ import annotations

import pandas as pd
import ray.data

REQUEST_COLUMNS = [
    "url", "url_norm", "host", "chain_id", "mode", "place",
    "priority", "page_seq", "deferred_rounds",
]


def schedule_round(
    requests: ray.data.Dataset,
    budget_per_host: int,
    crawl_delays: dict[str, float] | None = None,
    base_delay: float = 2.0,
) -> ray.data.Dataset:
    """Adds a ``scheduled`` bool column: True for the first ``budget`` rows
    of each host in (priority, page_seq, url_norm) order, False = deferred.
    robots Crawl-delay shrinks a host's budget by delay ratio
    (budget × base_delay / crawl_delay), min 1 — the offline analogue of a
    slower fetch cadence."""
    delays = crawl_delays or {}

    def sched(g: pd.DataFrame) -> pd.DataFrame:
        host = g["host"].iloc[0]
        budget = budget_per_host
        d = delays.get(host)
        if d and d > base_delay:
            budget = max(1, int(budget * base_delay / d))
        g = g.sort_values(
            ["priority", "page_seq", "url_crc", "url_norm"], kind="mergesort"
        )
        g = g.assign(scheduled=False)
        g.iloc[: budget, g.columns.get_loc("scheduled")] = True
        return g

    return requests.groupby("host").map_groups(sched, batch_format="pandas")


def schedule_round_local(
    pending,  # pyarrow.Table with REQUEST_COLUMNS
    budget_per_host: int,
    crawl_delays: dict[str, float] | None = None,
    base_delay: float = 2.0,
):
    """Vectorized driver-local scheduler — identical semantics to
    ``schedule_round`` (one stable sort + per-host rank < budget), used when
    the pending set fits comfortably in driver memory. At 10^10-frontier
    scale the pending set per round is budget-bounded (hosts × budget), so
    this stays small even when the frontier is huge; the Dataset groupby
    path above is the fallback for a pathological pending blow-up.

    Returns (scheduled: pa.Table, deferred: pa.Table).

    All Arrow C++ / numpy, no string-dominated sort: the per-host service
    order (priority, page_seq, url_crc, url_norm) is packed into one
    uint64 key — (priority+2^15) << 48 | page_seq << 32 | url_crc — so
    the sort compares integers; url_norm stays as the LAST sort key,
    touched only on exact crc collisions (full determinism without
    string-compare cost). Per-host rank then comes from run-length
    arithmetic over the dictionary-encoded host column. The pandas
    mergesort this replaces cost 2-3.7 s per round at the 38,400-chain
    bench (576k pending rows) ON THE DRIVER'S SERIAL CRITICAL PATH; this
    is ~0.4 s.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    delays = crawl_delays or {}
    n = pending.num_rows
    if n == 0:
        return pending, pending.slice(0, 0)
    c = pending.combine_chunks()
    hcode_arr = pc.dictionary_encode(c.column("host")).chunk(0).indices
    hcode = hcode_arr.to_numpy(zero_copy_only=False).astype(np.int64)
    prio = c.column("priority").to_numpy().astype(np.int64) + 32768  # sign-safe
    seq = c.column("page_seq").to_numpy().astype(np.uint64)
    crc = c.column("url_crc").to_numpy().astype(np.uint64)
    key = (prio.astype(np.uint64) << np.uint64(48)) | (seq << np.uint64(32)) | crc
    aux = pa.table(
        {"h": pa.array(hcode), "k": pa.array(key), "u": c.column("url_norm")}
    )
    idx = pc.sort_indices(
        aux,
        sort_keys=[("h", "ascending"), ("k", "ascending"), ("u", "ascending")],
    )
    idx_np = idx.to_numpy(zero_copy_only=False).astype(np.int64)
    t = c.take(idx)
    codes = hcode[idx_np]
    new_run = np.concatenate(([True], codes[1:] != codes[:-1]))
    run_starts = np.flatnonzero(new_run)
    rank = np.arange(n) - np.repeat(run_starts, np.diff(np.append(run_starts, n)))
    budgets = np.full(n, budget_per_host, dtype=np.int64)
    if delays:
        shrunk = {
            h: max(1, int(budget_per_host * base_delay / d))
            for h, d in delays.items()
            if d and d > base_delay
        }
        if shrunk:
            hosts_at_start = t.column("host").take(pa.array(run_starts)).to_pylist()
            for start, length, h in zip(
                run_starts, np.diff(np.append(run_starts, n)), hosts_at_start
            ):
                if h in shrunk:
                    budgets[start : start + length] = shrunk[h]
    mask = pa.array(rank < budgets)
    return t.filter(mask), t.filter(pc.invert(mask))
