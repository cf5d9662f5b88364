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
