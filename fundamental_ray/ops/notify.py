"""Notification filtering + district price rating (F4/J6/A4).

``is_property_allowed`` transcribes the conjunctive filter semantics of
models.TelegramFilters.IsPropertyAllowed (internal/models/telegram.go:39-124):
``Property.Price`` is a non-pointer int in Go, so a missing price reads as
0 (fails any min_price, passes a max-only filter); living_area / num_rooms
are pointers — missing + a configured bound rejects; district allow-list
matches postal[0:4]; energy-label allow-list matches exactly ("" rejects).

``price_ratings`` reproduces the telegram deal-rating flow
(internal/telegram/telegram.go:64-130): per-district sold median €/m²
(12-month window + data-quality predicate F2, database.go:1372-1417) is
computed once with a groupby, broadcast, and each listing's €/m² ratio maps
to a band with the reference's exact labels (telegram.go:87-99 /
telegram.go:110-122): ≤0.80 GREAT, ≤0.95 GOOD, ≤1.05 NORMAL, ≤1.20 BAD,
else HORRIBLE.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import ray.data


@dataclass
class NotifyFilters:
    min_price: int | None = None
    max_price: int | None = None
    min_living_area: int | None = None
    max_living_area: int | None = None
    min_num_rooms: int | None = None
    max_num_rooms: int | None = None
    districts: list[str] = field(default_factory=list)     # 4-digit prefixes
    energy_labels: list[str] = field(default_factory=list)


def is_property_allowed(row: dict, f: NotifyFilters) -> bool:
    def bound(value, lo, hi):
        if lo is None and hi is None:
            return True
        if value is None or (isinstance(value, float) and np.isnan(value)):
            return False  # configured bound + missing value ⇒ reject
        if lo is not None and value < lo:
            return False
        if hi is not None and value > hi:
            return False
        return True

    # Go Property.Price is a non-pointer int: missing ⇒ 0 (telegram.go:224)
    price = row.get("price")
    if price is None or (isinstance(price, float) and np.isnan(price)):
        price = 0
    if f.min_price is not None and price < f.min_price:
        return False
    if f.max_price is not None and price > f.max_price:
        return False
    if not bound(row.get("living_area"), f.min_living_area, f.max_living_area):
        return False
    if not bound(row.get("num_rooms"), f.min_num_rooms, f.max_num_rooms):
        return False
    if f.districts:
        pc = row.get("postal_code")
        if not pc or str(pc)[:4] not in f.districts:
            return False
    if f.energy_labels:
        el = row.get("energy_label")
        if not el or el not in f.energy_labels:
            return False
    return True


def filter_listings(listings: ray.data.Dataset, f: NotifyFilters) -> ray.data.Dataset:
    """F4 as a vectorized map_batches filter over a listings Dataset."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        mask = [is_property_allowed(r, f) for r in df.to_dict("records")]
        return df[pd.Series(mask, index=df.index)]

    return listings.map_batches(fn, batch_format="pandas")


RATING_BANDS = [(0.80, "GREAT"), (0.95, "GOOD"), (1.05, "NORMAL"), (1.20, "BAD")]


def rate(ratio: float) -> str:
    # telegram.go:87-99 — GREAT/GOOD/NORMAL/BAD/HORRIBLE
    for ub, label in RATING_BANDS:
        if ratio <= ub:
            return label
    return "HORRIBLE"


def district_sold_median(listings: pd.DataFrame, now: str = "2024-07-01") -> pd.Series:
    """A4 sold side (database.go:1374-1417): per-district exact median €/m²
    over sold rows passing F2 within the trailing 12 months of ``now``."""
    cutoff = (pd.Timestamp(now) - pd.DateOffset(months=12)).strftime("%Y-%m-%d")
    df = listings.copy()
    ok = (
        (df["status"] == "sold")
        & df["price"].notna() & df["living_area"].notna()
        & (df["price"] > 0) & (df["living_area"] > 0)
        & df["living_area"].between(15, 1000)
        & df["price"].between(50_000, 10_000_000)
        & df["selling_date"].notna() & (df["selling_date"] >= cutoff)
    )
    df = df[ok]
    df["district"] = df["postal_code"].str.slice(0, 4)
    df["psqm"] = df["price"] / df["living_area"]
    return df.groupby("district")["psqm"].median()


def price_ratings(
    listings: ray.data.Dataset, now: str = "2024-07-01"
) -> pd.DataFrame:
    """J6: broadcast the (tiny) district sold-median table against the
    listings Dataset; emit ratio + band per rateable listing."""
    import ray

    pdf = listings.to_pandas()  # medians need the sold subset anyway (small)
    med = district_sold_median(pdf, now)
    med_ref = ray.put(med)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        from ..pipelines.analytics import r2

        medians = ray.get(med_ref)
        df = df[df["price"].notna() & df["living_area"].notna() & (df["living_area"] > 0)]
        district = df["postal_code"].fillna("").str.slice(0, 4)
        m = district.map(medians)
        psqm = df["price"] / df["living_area"]
        ratio = psqm / m
        out = pd.DataFrame(
            {
                "url": df["url"], "district": district,
                "price_per_sqm": r2(psqm, 2), "ratio": r2(ratio, 4),
            }
        )
        out = out[ratio.notna()]
        out["rating"] = [rate(x) for x in out["ratio"]]
        return out

    return listings.map_batches(fn, batch_format="pandas").to_pandas().sort_values(
        "url"
    ).reset_index(drop=True)
