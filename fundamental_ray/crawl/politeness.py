"""Per-host politeness scheduling — the groupby-host + sort-by-priority
shuffle of the north rule.

The reference's live throttle (2 req/domain, 2 s delay, AutoThrottle,
settings.py:15-28) maps to a per-round token budget per host: a round is a
time slice; ``budget ≈ slice_seconds / effective_delay``. Requests beyond
the budget are **deferred** (re-queued next round, counter
``deferred-for-politeness``), preserving the reference's ordering contract
(SURVEY.md §3.1): within a host, requests are served in
``(priority, page_seq, url_norm)`` order.

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
        g = g.sort_values(["priority", "page_seq", "url_norm"], kind="mergesort")
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
    """
    import numpy as np
    import pyarrow as pa

    delays = crawl_delays or {}
    df = pending.to_pandas()
    df = df.sort_values(["host", "priority", "page_seq", "url_norm"], kind="mergesort")
    rank = df.groupby("host", sort=False).cumcount().to_numpy()
    budgets = np.full(len(df), budget_per_host, dtype=np.int64)
    if delays:
        shrunk = {
            h: max(1, int(budget_per_host * base_delay / d))
            for h, d in delays.items()
            if d and d > base_delay
        }
        if shrunk:
            budgets = df["host"].map(shrunk).fillna(budget_per_host).to_numpy(dtype=np.int64)
    mask = rank < budgets
    sched = pa.Table.from_pandas(df[mask], preserve_index=False)
    defer = pa.Table.from_pandas(df[~mask], preserve_index=False)
    return sched, defer
