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

    n = pending.num_rows
    if n == 0:
        return pending, pending.slice(0, 0)
    t, codes = _service_sort(pending)
    new_run = np.concatenate(([True], codes[1:] != codes[:-1]))
    run_starts = np.flatnonzero(new_run)
    run_lengths = np.diff(np.append(run_starts, n))
    rank = np.arange(n) - np.repeat(run_starts, run_lengths)
    budgets = np.repeat(
        _host_budgets(t, run_starts, budget_per_host, crawl_delays, base_delay),
        run_lengths,
    )
    mask = pa.array(rank < budgets)
    return t.filter(mask), t.filter(pc.invert(mask))


def _service_sort(pending):
    """ONE stable sort of the pending table into per-host service order
    (host runs; within a host: priority, page_seq, url_crc, url_norm).
    Returns (sorted table, per-row host codes). Shared by the per-round
    scheduler and the drain plan."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    c = pending.combine_chunks()
    hcode_arr = pc.dictionary_encode(c.column("host")).chunk(0).indices
    hcode = hcode_arr.to_numpy(zero_copy_only=False).astype(np.int64)
    prio_raw = c.column("priority").to_numpy().astype(np.int64)
    seq_raw = c.column("page_seq").to_numpy().astype(np.int64)
    # REQUEST_SCHEMA declares both int32, but the packed key only gives
    # priority 16 bits (sign-shifted) and page_seq 16 bits; values outside
    # those ranges would silently bleed into higher key fields and corrupt
    # the per-host service order, so out-of-range batches take the explicit
    # (slower, width-unlimited) column sort instead.
    if (
        prio_raw.size
        and (
            prio_raw.min() < -32768
            or prio_raw.max() >= 32768
            or seq_raw.min() < 0
            or seq_raw.max() >= 1 << 16
        )
    ):
        aux = pa.table(
            {
                "h": pa.array(hcode),
                "p": c.column("priority"),
                "s": c.column("page_seq"),
                "c": c.column("url_crc"),
                "u": c.column("url_norm"),
            }
        )
        idx = pc.sort_indices(
            aux,
            sort_keys=[(k, "ascending") for k in ("h", "p", "s", "c", "u")],
        )
    else:
        prio = prio_raw + 32768  # sign-safe
        seq = seq_raw.astype(np.uint64)
        crc = c.column("url_crc").to_numpy().astype(np.uint64)
        key = (
            (prio.astype(np.uint64) << np.uint64(48)) | (seq << np.uint64(32)) | crc
        )
        aux = pa.table(
            {"h": pa.array(hcode), "k": pa.array(key), "u": c.column("url_norm")}
        )
        idx = pc.sort_indices(
            aux,
            sort_keys=[("h", "ascending"), ("k", "ascending"), ("u", "ascending")],
        )
    idx_np = idx.to_numpy(zero_copy_only=False).astype(np.int64)
    return c.take(idx), hcode[idx_np]


def _host_budgets(t, run_starts, budget_per_host, crawl_delays, base_delay):
    """Per-host-run budget vector (len == len(run_starts)); robots
    Crawl-delay shrinks a host's budget by delay ratio, min 1."""
    import numpy as np
    import pyarrow as pa

    budgets = np.full(len(run_starts), budget_per_host, dtype=np.int64)
    delays = crawl_delays or {}
    if delays:
        shrunk = {
            h: max(1, int(budget_per_host * base_delay / d))
            for h, d in delays.items()
            if d and d > base_delay
        }
        if shrunk:
            hosts_at_start = t.column("host").take(pa.array(run_starts)).to_pylist()
            for i, h in enumerate(hosts_at_start):
                if h in shrunk:
                    budgets[i] = shrunk[h]
    return budgets


def host_bucket_array(hosts, num_buckets: int):
    """crc32(host) % B for a host column (pyarrow array / list / numpy) —
    the backlog partition key. Vectorized over UNIQUE hosts (the host set
    is tiny next to the request set), then broadcast by dictionary code."""
    import zlib

    import numpy as np
    import pandas as pd

    codes, uniq = pd.factorize(np.asarray(hosts, dtype=object))
    per_uniq = np.array(
        [zlib.crc32(h.encode("utf-8")) % num_buckets for h in uniq],
        dtype=np.int64,
    )
    return per_uniq[codes] if len(codes) else np.empty(0, dtype=np.int64)


def split_by_host_bucket(table, num_buckets: int):
    """REQUEST table → list of B per-bucket tables (driver/resume path and
    the per-round retry routing; both are small — the BULK backlog is
    partitioned inside the bucket scheduler tasks and never comes here)."""
    import numpy as np
    import pyarrow as pa

    if table.num_rows == 0:
        return [table.slice(0, 0) for _ in range(num_buckets)]
    b = host_bucket_array(table.column("host").to_numpy(zero_copy_only=False),
                          num_buckets)
    return [
        table.filter(pa.array(b == i)) if (b == i).any() else table.slice(0, 0)
        for i in range(num_buckets)
    ]


class DrainPlan:
    """Precomputed schedule for the post-discovery DRAIN phase of a crawl.

    Once every chain is done, no new request can ever enter the frontier:
    the deferred backlog is a fixed set served in fixed per-host
    budget-per-round slices. Re-running the full scheduler each round costs
    O(backlog) sort+filter+copy PER ROUND — at the 76,800-chain polite
    bench that is 92.4M cumulative re-deferred row touches across 128
    rounds, and it dominated the polite variant's wall time. This plan
    sorts the backlog into service order ONCE and then serves each round
    with zero-copy per-host range takes + a cursor advance: per-round cost
    is O(scheduled), not O(backlog).

    Round-for-round IDENTICAL service sets to the per-round scheduler:
    same sort key, same static budgets (robots rules don't change
    mid-crawl), and a stable sort of an already-sorted backlog is the
    identity — so the seen set, the listings output, and every per-round
    counter are unchanged (test-pinned against the naive path).

    Transient-retry rows (attempt+1) re-enter through ``push_extras``: a
    retry's service key is ≤ every key still behind its host's cursor (it
    was scheduled BEFORE them), so serving extras first within the host's
    budget reproduces exactly what re-sorting the union would do.
    """

    def __init__(self, pending, budget_per_host, crawl_delays=None, base_delay=2.0):
        import numpy as np
        import pyarrow as pa

        t, codes = _service_sort(pending)
        n = t.num_rows
        new_run = np.concatenate(([True], codes[1:] != codes[:-1]))
        self.table = t
        self.starts = np.flatnonzero(new_run)
        self.ends = np.append(self.starts[1:], n)
        self.budgets = _host_budgets(
            t, self.starts, budget_per_host, crawl_delays, base_delay
        )
        self.cursors = self.starts.copy()
        self.hosts = [h for h in t.column("host").take(pa.array(self.starts)).to_pylist()] if n else []
        self.host_index = {h: i for i, h in enumerate(self.hosts)}
        self.extras = None  # retry overlay (tiny, served first)

    @property
    def remaining(self) -> int:
        base = int((self.ends - self.cursors).sum()) if len(self.starts) else 0
        return base + (self.extras.num_rows if self.extras is not None else 0)

    def push_extras(self, rows) -> None:
        """Queue retry rows (already in service-key order per host) to be
        served at the next round's front of their host's budget."""
        import pyarrow as pa

        if rows.num_rows == 0:
            return
        if self.extras is not None and self.extras.num_rows:
            rows = pa.concat_tables([self.extras, rows], promote_options="default")
        self.extras = rows

    def next_round(self):
        """Serve one round: (scheduled table, rows left after this round).
        O(scheduled) — the backlog table is never copied or re-sorted."""
        import numpy as np
        import pyarrow as pa

        served_budget = self.budgets.copy()
        parts = []
        if self.extras is not None and self.extras.num_rows:
            ex = self.extras
            keep_idx = []
            serve_idx = []
            seen_per_host: dict[int, int] = {}
            ex_hosts = ex.column("host").to_pylist()
            for ri, h in enumerate(ex_hosts):
                hi = self.host_index.get(h)
                # host unknown to the plan (can't happen in practice:
                # extras originate from the backlog) — serve unbudgeted
                if hi is None:
                    serve_idx.append(ri)
                    continue
                k = seen_per_host.get(hi, 0)
                if k < served_budget[hi]:
                    serve_idx.append(ri)
                    seen_per_host[hi] = k + 1
                else:
                    keep_idx.append(ri)
            if serve_idx:
                parts.append(ex.take(pa.array(serve_idx, pa.int64())))
            for hi, k in seen_per_host.items():
                served_budget[hi] -= k
            self.extras = (
                ex.take(pa.array(keep_idx, pa.int64())) if keep_idx else None
            )
        lo = self.cursors
        hi = np.minimum(lo + served_budget, self.ends)
        count = int((hi - lo).sum())
        if count:
            # concatenated per-host ranges -> one take
            idx = np.concatenate(
                [np.arange(a, b) for a, b in zip(lo, hi) if b > a]
            )
            parts.append(self.table.take(pa.array(idx, pa.int64())))
        self.cursors = hi
        if parts:
            scheduled = (
                parts[0] if len(parts) == 1
                else pa.concat_tables(parts, promote_options="default")
            )
        else:
            scheduled = self.table.slice(0, 0)
        return scheduled, self.remaining

    def remainder_table(self):
        """The not-yet-served backlog as a table (checkpoint/resume path
        only — O(remaining), never called in the steady-state loop)."""
        import numpy as np
        import pyarrow as pa

        parts = []
        if self.extras is not None and self.extras.num_rows:
            parts.append(self.extras)
        idx = np.concatenate(
            [np.arange(a, b) for a, b in zip(self.cursors, self.ends) if b > a]
        ) if len(self.starts) else np.array([], dtype=np.int64)
        if len(idx):
            parts.append(self.table.take(pa.array(idx, pa.int64())))
        if not parts:
            return self.table.slice(0, 0)
        return (
            parts[0] if len(parts) == 1
            else pa.concat_tables(parts, promote_options="default")
        )
