"""Property store: latest-wins merge with the reference's status machine.

Reproduces the SQLite upsert transaction (database.go:766-915) as a
``groupby('url').map_groups`` round merge — state lives in Parquet between
rounds, not in workers (SURVEY.md §7.3):

- new url          → insert, republish_count=0      (database.go:853-880)
- existing, stored status 'inactive' + incoming 'active'
                   → status 'republished', republish_count += 1
                     (database.go:786-793; spider sends 'active',
                      funda_spider.py:200-204)
- existing other   → plain field update (living_area kept only when > 0,
                     database.go:805)
- every delta row  → property_history append (status, price, listing_date)
                     (database.go:836-847)

``mark_inactive`` is the weekly-refresh anti-join J4 (database.go:1252-1323):
active rows of a city whose url is absent from the refresh crawl's URL set
flip to 'inactive'.

The merge key is the raw ``url`` (the store's UNIQUE column,
database.go:392); one delta row per url per round (upstream dedup
guarantees it).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ..extraction.listing import LISTING_SCHEMA

STORE_EXTRA = [
    ("republish_count", pa.int32()),
    ("last_updated_round", pa.int32()),
    ("first_seen_round", pa.int32()),
]
STORE_SCHEMA = pa.schema(list(LISTING_SCHEMA) + [pa.field(n, t) for n, t in STORE_EXTRA])

_FIELDS = [f.name for f in LISTING_SCHEMA]
_UPDATE_FIELDS = [f for f in _FIELDS if f != "url"]


def _clean_area(v):
    # database.go:805 — CASE WHEN living_area > 0 THEN living_area ELSE NULL
    return v if v is not None and not pd.isna(v) and v > 0 else None


def merge_round(
    store: ray.data.Dataset | None,
    delta: ray.data.Dataset,
    round_no: int,
) -> ray.data.Dataset:
    """One round's upsert; returns the new store Dataset. The per-group
    function sees at most (1 store row + 1 delta row)."""

    def with_src(src: str, extra_cols: bool):
        def f(t: pa.Table) -> pa.Table:
            t = t.select([c for c in t.column_names if c in set(_FIELDS) | {
                "republish_count", "last_updated_round", "first_seen_round"}])
            if extra_cols is False:
                for name, typ in STORE_EXTRA:
                    t = t.append_column(name, pa.nulls(t.num_rows, typ))
            t = t.append_column("_src", pa.array([src] * t.num_rows))
            return t

        return f

    parts = []
    if store is not None:
        parts.append(store.map_batches(with_src("store", True), batch_format="pyarrow"))
    parts.append(delta.map_batches(with_src("delta", False), batch_format="pyarrow"))
    both = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        old = g[g["_src"] == "store"]
        new = g[g["_src"] == "delta"]
        if len(new) == 0:
            return old.drop(columns=["_src"])
        n = new.iloc[0].to_dict()
        n["living_area"] = _clean_area(n.get("living_area"))
        if len(old) == 0:
            n["republish_count"] = 0
            n["first_seen_round"] = round_no
        else:
            o = old.iloc[0].to_dict()
            rc = int(o.get("republish_count") or 0)
            if o.get("status") == "inactive" and n.get("status") == "active":
                n["status"] = "republished"
                rc += 1
            n["republish_count"] = rc
            n["first_seen_round"] = o["first_seen_round"]
        n["last_updated_round"] = round_no
        n.pop("_src", None)
        return pd.DataFrame([n])

    merged = both.groupby("url").map_groups(merge, batch_format="pandas")

    def cast(t: pa.Table) -> pa.Table:
        cols = {}
        for f in STORE_SCHEMA:
            if f.name in t.column_names:
                cols[f.name] = t.column(f.name).cast(f.type)
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        return pa.table(cols)

    return merged.map_batches(cast, batch_format="pyarrow")


def history_delta(store: ray.data.Dataset, round_no: int) -> ray.data.Dataset:
    """property_history append rows for this round (database.go:836-847):
    exactly the store rows the round touched, post-transition status."""
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


def previous_price(history: ray.data.Dataset) -> ray.data.Dataset:
    """J7 (database.go:1420-1438): per url, the price one observation back —
    ORDER BY listing_date DESC LIMIT 1 OFFSET 1 — with `round` as the
    deterministic tiebreak the SQLite rowid ordering implies."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["listing_date", "round"], ascending=[False, False])
        prev = g["price"].iloc[1] if len(g) > 1 else None
        return pd.DataFrame([{"url": g["url"].iloc[0], "previous_price": prev}])

    return history.groupby("url").map_groups(f, batch_format="pandas")
