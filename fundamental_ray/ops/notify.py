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


# ----------------------------------------------------------------- rendering
def format_number(num: float) -> str:
    """telegram.go:133-144 formatNumber: fmt.Sprintf("%.0f") (half-even,
    like Python's :.0f) then thousand separators every 3 digits."""
    int_part = f"{num:.0f}".split(".")[0]
    out: list[str] = []
    for j, ch in enumerate(reversed(int_part)):
        if j > 0 and j % 3 == 0:
            out.insert(0, ",")
        out.insert(0, ch)
    return "".join(out)


def _go_v(value) -> str:
    """Go %v of a float64/int that is integral prints without a decimal."""
    if value is None or (isinstance(value, float) and np.isnan(value)):
        return "N/A"
    f = float(value)
    return str(int(f)) if f == int(f) else str(f)


def district_analysis_tables(
    listings: pd.DataFrame, now: str = "2024-07-01"
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """GetDistrictPriceAnalysis (database.go:1326-1417) for every district
    at once: F2-quality active median/count and 12-month sold median/count
    of price-per-m²."""
    df = listings.copy()
    ok = (
        df["price"].notna() & df["living_area"].notna()
        & (df["price"] > 0) & (df["living_area"] > 0)
        & df["living_area"].between(15, 1000)
        & df["price"].between(50_000, 10_000_000)
    )
    df = df[ok]
    df["district"] = df["postal_code"].str.slice(0, 4)
    df["psqm"] = df["price"].astype(float) / df["living_area"].astype(float)
    act = (
        df[df["status"] == "active"]
        .groupby("district")["psqm"]
        .agg(m="median", c="size")
        .reset_index()
    )
    cutoff = (pd.Timestamp(now) - pd.DateOffset(months=12)).strftime("%Y-%m-%d")
    sold = (
        df[(df["status"] == "sold") & df["selling_date"].notna()
           & (df["selling_date"] >= cutoff)]
        .groupby("district")["psqm"]
        .agg(m="median", c="size")
        .reset_index()
    )
    return act.set_index("district"), sold.set_index("district")


def _comparison_block(psqm: float, med, count, head: str, none_text: str) -> str:
    # telegram.go:85-126: one district-median comparison paragraph
    if med is not None and not pd.isna(med) and med > 0:
        ratio = psqm / med
        rating = f"<b>{rate(ratio)}</b>"
        diff = (ratio - 1) * 100
        return f"{head} ({int(count)} properties):\n{rating} ({diff:+.1f}% vs. median)"
    return f"{head} (0 properties):\n{none_text}"


def price_analysis_text(
    price: float, living_area: float, postal_code: str,
    act: pd.DataFrame, sold: pd.DataFrame,
) -> str:
    """getPriceAnalysis (telegram.go:64-130): the District Analysis body."""
    district = postal_code[:4]
    a_m = a_c = s_m = s_c = None
    if district in act.index:
        a_m, a_c = act.loc[district, "m"], act.loc[district, "c"]
    if district in sold.index:
        s_m, s_c = sold.loc[district, "m"], sold.loc[district, "c"]
    psqm = price / living_area
    return (
        "📊 <u>District Analysis</u>\n"
        + _comparison_block(psqm, a_m, a_c, "Current listings",
                            "No active listings for comparison")
        + "\n\n"
        + _comparison_block(psqm, s_m, s_c, "Past year sales",
                            "No recent sales for comparison")
    )


def render_new_property_message(
    row: dict, act: pd.DataFrame, sold: pd.DataFrame,
    previous_price: float | None = None,
) -> str:
    """NotifyNewProperty's message body (telegram.go:198-423), byte-exact:
    title/republish variants, thousand-separated price text with the
    previous-price delta line, %v-style N/A fields, district analysis."""

    def num(v, default=0.0):
        return default if v is None or (isinstance(v, float) and np.isnan(v)) else float(v)

    price = num(row.get("price"))
    living_area = num(row.get("living_area"))
    postal_code = row.get("postal_code")
    postal_code = postal_code if isinstance(postal_code, str) and postal_code else "Unknown"

    if price > 0 and living_area > 0 and postal_code != "Unknown":
        analysis = price_analysis_text(price, living_area, postal_code, act, sold)
    else:
        analysis = "N/A (price analysis unavailable)"

    title = "<b>New Property Listed!</b>"
    price_text = f"💰 €{format_number(price)}"
    if row.get("status") == "republished":
        rc = int(row.get("republish_count") or 1)
        title = (
            f"<b>⚡ Property Republished! ({rc} times)</b>"
            if rc > 1 else "<b>⚡ Property Republished!</b>"
        )
        if previous_price is not None and previous_price > 0:
            diff = price - float(previous_price)
            pct = diff / float(previous_price) * 100
            arrow = "📈" if diff > 0 else "📉"
            price_text = (
                f"💰 €{format_number(price)} ({arrow} {pct:+.1f}% "
                f"from €{format_number(float(previous_price))})"
            )

    psqm_text = format_number(price / living_area) if living_area else "N/A"
    street = row.get("street") if isinstance(row.get("street"), str) else ""
    city = row.get("city") if isinstance(row.get("city"), str) else ""
    el = row.get("energy_label") if isinstance(row.get("energy_label"), str) else ""
    return (
        f"{title}\n\n"
        f"🏠 {street}\n"
        f"📍 {city}, {postal_code}\n"
        f"{price_text}\n"
        f"📐 {_go_v(living_area)} m²\n"
        f"💵 €{psqm_text}/m²\n"
        f"🏗️ Built: {_go_v(row.get('year_built'))}\n"
        f"🚪 Rooms: {_go_v(row.get('num_rooms'))}\n"
        f"⚡ Energy label: {el}\n\n"
        f"{analysis}\n\n"
        f'🔗 <a href="{row.get("url")}">View on Funda</a>'
    )


def notify_messages(
    listings: ray.data.Dataset, f: NotifyFilters, now: str = "2024-07-01"
) -> pd.DataFrame:
    """New-listing notification flow (manager.go:168-179 → telegram.go:
    198-423): filter the delta, broadcast the (tiny) district analysis
    tables, render one message per surviving listing."""
    import ray

    tables = district_analysis_tables(listings.to_pandas(), now)
    ref = ray.put(tables)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        act, sold = ray.get(ref)
        keep = [r for r in df.to_dict("records") if is_property_allowed(r, f)]
        return pd.DataFrame(
            {
                "url": [r["url"] for r in keep],
                "message": [render_new_property_message(r, act, sold) for r in keep],
            }
        )

    out = listings.map_batches(fn, batch_format="pandas").to_pandas()
    return out.sort_values("url").reset_index(drop=True)
