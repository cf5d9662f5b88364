"""Property store: latest-wins merge with the reference's status machine.

Reproduces the SQLite upsert transaction (database.go:766-915) as a
**bucketized vectorized fold**: rows are hash-partitioned on ``url`` into a
bounded number of buckets, and each bucket task folds *all* its urls with
vectorized pandas masks — never one pandas frame per url (that shape is
billions of python round-trips at 10^10 urls; see events_sessionize for the
same pattern over the events log):

- new url          → insert, republish_count=0      (database.go:853-880)
- existing, stored status 'inactive' + incoming 'active'
                   → status 'republished', republish_count += 1
                     (database.go:786-793; spider sends 'active',
                      funda_spider.py:200-204)
- existing other   → plain field update (living_area kept only when > 0,
                     database.go:805)
- every delta row  → property_history append (status, price, listing_date)
                     (database.go:836-847)

A round may carry **two delta rows for one url** (paired active+sold crawls
of one place). The fold applies them row-at-a-time like the reference's
sequential upsert, in a deterministic order (status ascending: 'active'
before 'sold'), so the winner is stable and *both* rows append history.

``mark_inactive`` is the weekly-refresh anti-join J4 (database.go:1252-1323):
active rows of a city whose url is absent from the refresh crawl's URL set
flip to 'inactive'.

The merge key is the raw ``url`` (the store's UNIQUE column,
database.go:392).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..extraction.listing import LISTING_SCHEMA

STORE_EXTRA = [
    ("republish_count", pa.int32()),
    ("last_updated_round", pa.int32()),
    ("first_seen_round", pa.int32()),
]
# geocode columns (schema evolution v2, mirroring database.go:480-584's
# ALTER TABLE ... ADD COLUMN migrations): preserved across field updates —
# the upsert's UPDATE never touches them (database.go:795-815)
GEO_EXTRA = [
    ("latitude", pa.float64()),
    ("longitude", pa.float64()),
    ("geocoding_attempted", pa.int32()),
]
STORE_SCHEMA = pa.schema(
    list(LISTING_SCHEMA)
    + [pa.field(n, t) for n, t in STORE_EXTRA]
    + [pa.field(n, t) for n, t in GEO_EXTRA]
)

_FIELDS = [f.name for f in LISTING_SCHEMA]
_EXTRA = [n for n, _ in STORE_EXTRA] + [n for n, _ in GEO_EXTRA]

NUM_MERGE_BUCKETS = 256  # fold parallelism; each bucket folds many urls


def _bucket_series(urls: pd.Series, num_buckets: int) -> np.ndarray:
    # deterministic vectorized hash (pandas siphash with its fixed key) —
    # bucket choice never affects results, only partitioning
    return (pd.util.hash_pandas_object(urls, index=False).to_numpy() % num_buckets).astype(
        np.int32
    )


def _tag(src_rank: int, num_buckets: int):
    """Normalize either side to the store schema + (_rank, bucket)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(index=df.index)
        for c in _FIELDS:
            out[c] = df[c] if c in df.columns else None
        for c in _EXTRA:
            out[c] = df[c] if c in df.columns else None
        out["_rank"] = np.int8(src_rank)
        out["bucket"] = _bucket_series(out["url"], num_buckets)
        return out

    return f


def _fold_bucket(g: pd.DataFrame, round_no: int, emit_history: bool) -> pd.DataFrame:
    """Vectorized per-bucket fold of (store rows, delta rows) → new store
    rows (+ history rows when ``emit_history``, marked ``_kind='hist'``)."""
    g = g.sort_values(["url", "_rank", "status"], kind="mergesort")
    old = g[g["_rank"] == 0]
    dl = g[g["_rank"] == 1].copy()

    # database.go:805 — living_area kept only when > 0
    la = pd.to_numeric(dl["living_area"], errors="coerce")
    dl["living_area"] = la.where(la.notna() & (la > 0), other=None)

    old_by_url = old.set_index("url")
    # sequential-fold summary: the FIRST delta row (status-asc order) decides
    # the republish transition; the LAST delta row wins the field update
    first_mask = ~dl["url"].duplicated(keep="first")
    firsts = dl[first_mask].set_index("url")
    merged = dl[~dl["url"].duplicated(keep="last")].copy()
    urls = merged["url"]

    old_status = urls.map(old_by_url["status"]) if len(old) else pd.Series(None, index=urls.index, dtype=object)
    old_rc = (
        urls.map(old_by_url["republish_count"]) if len(old) else pd.Series(np.nan, index=urls.index)
    )
    old_first_seen = (
        urls.map(old_by_url["first_seen_round"]) if len(old) else pd.Series(np.nan, index=urls.index)
    )
    first_status = urls.map(firsts["status"])
    repub = (old_status == "inactive") & (first_status == "active")
    single = ~urls.isin(dl.loc[dl["url"].duplicated(keep=False), "url"])

    merged["republish_count"] = (
        pd.to_numeric(old_rc, errors="coerce").fillna(0).astype("int64")
        + repub.astype("int64")
    )
    merged["first_seen_round"] = (
        pd.to_numeric(old_first_seen, errors="coerce").fillna(round_no).astype("int64")
    )
    merged["last_updated_round"] = np.int64(round_no)
    # geocode columns survive the field update (database.go:795-815's
    # UPDATE column list never includes them); new urls start unattempted
    if len(old):
        merged["latitude"] = urls.map(old_by_url["latitude"])
        merged["longitude"] = urls.map(old_by_url["longitude"])
        merged["geocoding_attempted"] = (
            pd.to_numeric(urls.map(old_by_url["geocoding_attempted"]), errors="coerce")
            .fillna(0)
            .astype("int64")
        )
    else:
        merged["latitude"] = np.nan
        merged["longitude"] = np.nan
        merged["geocoding_attempted"] = np.int64(0)
    # single-delta urls whose transition fired surface as 'republished';
    # with two deltas the second row's own status wins (sequential fold)
    merged.loc[repub & single, "status"] = "republished"

    untouched = old[~old["url"].isin(dl["url"])]
    out = pd.concat([untouched, merged], ignore_index=True)
    out = out[_FIELDS + _EXTRA]
    if not emit_history:
        return out
    out["_kind"] = "store"
    out["_hist_round"] = np.int64(round_no)
    if len(dl):
        hist = dl[_FIELDS + _EXTRA].copy()
        # post-transition status per delta row: only a url's first row can
        # have been rewritten to 'republished' (later rows see a
        # non-inactive state)
        repub_urls = set(urls[repub])
        fm = first_mask.reindex(hist.index, fill_value=False)
        rewrite = fm.to_numpy() & hist["url"].isin(repub_urls).to_numpy() & (
            hist["status"] == "active"
        ).to_numpy()
        hist.loc[rewrite, "status"] = "republished"
        hist["_kind"] = "hist"
        hist["_hist_round"] = np.int64(round_no)
        out = pd.concat([out, hist], ignore_index=True)
    return out


def _cast_store(t: pa.Table) -> pa.Table:
    cols = {}
    for f in STORE_SCHEMA:
        if f.name in t.column_names:
            cols[f.name] = t.column(f.name).cast(f.type)
        else:
            cols[f.name] = pa.nulls(t.num_rows, f.type)
    return pa.table(cols)


def _merged(
    store: ray.data.Dataset | None,
    delta: ray.data.Dataset,
    round_no: int,
    emit_history: bool,
    num_buckets: int,
) -> ray.data.Dataset:
    parts = []
    if store is not None:
        parts.append(store.map_batches(_tag(0, num_buckets), batch_format="pandas"))
    parts.append(delta.map_batches(_tag(1, num_buckets), batch_format="pandas"))
    both = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    return both.groupby("bucket").map_groups(
        _fold_bucket,
        fn_kwargs={"round_no": round_no, "emit_history": emit_history},
        batch_format="pandas",
    )


def merge_round(
    store: ray.data.Dataset | None,
    delta: ray.data.Dataset,
    round_no: int,
    num_buckets: int = NUM_MERGE_BUCKETS,
) -> ray.data.Dataset:
    """One round's upsert; returns the new store Dataset."""
    return _merged(store, delta, round_no, False, num_buckets).map_batches(
        _cast_store, batch_format="pyarrow"
    )


HISTORY_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.string()),
        ("price", pa.int64()),
        ("listing_date", pa.string()),
        ("round", pa.int32()),
    ]
)


def merge_round_full(
    store: ray.data.Dataset | None,
    delta: ray.data.Dataset,
    round_no: int,
    num_buckets: int = NUM_MERGE_BUCKETS,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Like merge_round but also returns the round's property_history
    appends — one row per DELTA row (database.go:836-847), so a paired
    active+sold round appends twice for a shared url. One fold pass,
    materialized once, split by the ``_kind`` marker."""
    merged = _merged(store, delta, round_no, True, num_buckets).materialize()

    def split(kind: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["_kind"] == kind]

        return f

    new_store = (
        merged.map_batches(split("store"), batch_format="pandas")
        .drop_columns(["_kind", "_hist_round"])
        .map_batches(_cast_store, batch_format="pyarrow")
    )

    def hist_cast(df: pd.DataFrame) -> pa.Table:
        df = df[df["_kind"] == "hist"]
        return pa.table(
            {
                "url": pa.array(df["url"], pa.string()),
                "status": pa.array(df["status"], pa.string()),
                "price": pa.array(pd.to_numeric(df["price"], errors="coerce"), pa.int64()),
                "listing_date": pa.array(df["listing_date"], pa.string()),
                "round": pa.array(df["_hist_round"], pa.int32()),
            }
        )

    history = merged.map_batches(hist_cast, batch_format="pandas")
    return new_store, history


def history_delta(store: ray.data.Dataset, round_no: int) -> ray.data.Dataset:
    """property_history append rows for this round (database.go:836-847):
    the store rows the round touched, post-transition status. (For the
    paired two-deltas-per-url round use merge_round_full, which appends one
    history row per delta row.)"""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        mask = pc.equal(t.column("last_updated_round"), round_no)
        t = t.filter(mask)
        return pa.table(
            {
                "url": t.column("url"),
                "status": t.column("status"),
                "price": t.column("price"),
                "listing_date": t.column("listing_date"),
                "round": pa.array([round_no] * t.num_rows, pa.int32()),
            }
        )

    return store.map_batches(f, batch_format="pyarrow")


def mark_inactive(
    store: ray.data.Dataset, city: str, active_urls: set[str], round_no: int
) -> ray.data.Dataset:
    """J4 — refresh anti-join: active rows of ``city`` not in ``active_urls``
    flip to 'inactive'. URL set is broadcast (ray.put) and probed per batch;
    at 10^10 scale the probe swaps in the sharded seen actors."""
    import ray

    ref = ray.put(frozenset(active_urls))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        urls = ray.get(ref)
        hit = (
            (df["city"].str.lower() == city.lower())
            & (df["status"] == "active")
            & ~df["url"].isin(urls)
        )
        df = df.copy()
        df.loc[hit, "status"] = "inactive"
        df.loc[hit, "last_updated_round"] = round_no
        return df

    return store.map_batches(f, batch_format="pandas")


def previous_price(
    history: ray.data.Dataset, num_buckets: int = NUM_MERGE_BUCKETS
) -> ray.data.Dataset:
    """J7 (database.go:1420-1438): per url, the price one observation back —
    ORDER BY listing_date DESC LIMIT 1 OFFSET 1 — with `round` as the
    deterministic tiebreak the SQLite rowid ordering implies. Bucketized
    vectorized fold: one sort + cumcount per bucket, never per url."""

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = _bucket_series(df["url"], num_buckets)
        return df

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["url", "listing_date", "round"],
            ascending=[True, False, False],
            na_position="last",  # None listing_date sorts like "" (lowest)
            kind="mergesort",
        )
        nth = g.groupby("url", sort=False).cumcount()
        base = g.loc[~g["url"].duplicated(keep="first"), ["url"]]
        second = g.loc[nth == 1, ["url", "price"]].rename(
            columns={"price": "previous_price"}
        )
        return base.merge(second, on="url", how="left")

    return (
        history.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )


def migrate_store(store: ray.data.Dataset) -> ray.data.Dataset:
    """Schema evolution (database.go:480-584): bring a store written under
    an older schema up to STORE_SCHEMA by adding the missing columns with
    their defaults (ALTER TABLE ... ADD COLUMN semantics:
    geocoding_attempted DEFAULT 0, everything else NULL). Columns already
    present pass through unchanged, so re-migrating is a no-op."""

    def f(t: pa.Table) -> pa.Table:
        cols = {}
        for fld in STORE_SCHEMA:
            if fld.name in t.column_names:
                cols[fld.name] = t.column(fld.name).cast(fld.type)
            elif fld.name == "geocoding_attempted":
                cols[fld.name] = pa.array([0] * t.num_rows, fld.type)
            else:
                cols[fld.name] = pa.nulls(t.num_rows, fld.type)
        return pa.table(cols)

    return store.map_batches(f, batch_format="pyarrow")
