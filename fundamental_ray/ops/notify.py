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
import pyarrow as pa
import pyarrow.compute as pc
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


def allowed_mask(t: pa.Table, f: NotifyFilters) -> pa.Array:
    """``is_property_allowed`` as Arrow column masks over a whole batch —
    same conjunctive semantics (telegram.go:39-124), zero per-row Python.
    The scalar function above stays as the unit-test twin."""
    n = t.num_rows
    mask = np.ones(n, dtype=bool)
    if f.min_price is not None or f.max_price is not None:
        # Go Property.Price is a non-pointer int: missing ⇒ 0 (telegram.go:224)
        price = np.nan_to_num(
            t.column("price").to_numpy(zero_copy_only=False).astype(np.float64),
            nan=0.0,
        )
        if f.min_price is not None:
            mask &= price >= f.min_price
        if f.max_price is not None:
            mask &= price <= f.max_price
    for col, lo, hi in (
        ("living_area", f.min_living_area, f.max_living_area),
        ("num_rooms", f.min_num_rooms, f.max_num_rooms),
    ):
        if lo is None and hi is None:
            continue
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)  # configured bound + missing value ⇒ reject
        if lo is not None:
            ok &= np.nan_to_num(v, nan=-np.inf) >= lo
        if hi is not None:
            ok &= np.nan_to_num(v, nan=np.inf) <= hi
        mask &= ok
    if f.districts:
        d4 = pc.utf8_slice_codeunits(t.column("postal_code"), 0, 4)
        hit = pc.fill_null(pc.is_in(d4, value_set=pa.array(f.districts)), False)
        mask &= hit.to_numpy(zero_copy_only=False)
    if f.energy_labels:
        hit = pc.fill_null(
            pc.is_in(t.column("energy_label"), value_set=pa.array(f.energy_labels)),
            False,
        )
        mask &= hit.to_numpy(zero_copy_only=False)
    return pa.array(mask)


def filter_listings(listings: ray.data.Dataset, f: NotifyFilters) -> ray.data.Dataset:
    """F4 as an Arrow-native vectorized filter: integer columns keep their
    int64 dtype through the stage (no pandas nullable-int → float64
    coercion), and the mask is pure column kernels."""

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(allowed_mask(t, f))

    return listings.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


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


def district_analysis_tables_ds(
    listings: ray.data.Dataset, now: str = "2024-07-01"
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """``district_analysis_tables`` computed DISTRIBUTED (A4 as a Dataset
    op): F2-quality prep inside map_batches, one groupby('district')
    exchange computing the active and sold median/count in the same pass.
    Only the per-district result table (thousands of rows, not the corpus)
    ever reaches the driver — the broadcastable small side of J6."""
    cutoff = (pd.Timestamp(now) - pd.DateOffset(months=12)).strftime("%Y-%m-%d")

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ok = (
            df["price"].notna() & df["living_area"].notna()
            & (df["price"] > 0) & (df["living_area"] > 0)
            & df["living_area"].between(15, 1000)
            & df["price"].between(50_000, 10_000_000)
        )
        df = df[ok].copy()
        out = pd.DataFrame(
            {
                "district": df["postal_code"].str.slice(0, 4),
                "psqm": df["price"].astype(float) / df["living_area"].astype(float),
                "is_active": (df["status"] == "active").to_numpy(),
                "is_recent_sold": (
                    (df["status"] == "sold")
                    & df["selling_date"].notna()
                    & (df["selling_date"] >= cutoff)
                ).to_numpy(),
            }
        )
        return out[out["is_active"] | out["is_recent_sold"]]

    def both(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["is_active"]]["psqm"]
        s = g[g["is_recent_sold"]]["psqm"]
        return pd.DataFrame(
            [
                {
                    "district": g["district"].iloc[0],
                    "am": a.median() if len(a) else np.nan, "ac": len(a),
                    "sm": s.median() if len(s) else np.nan, "sc": len(s),
                }
            ]
        )

    res = (
        listings.map_batches(prep, batch_format="pandas")
        .groupby("district")
        .map_groups(both, batch_format="pandas")
        .to_pandas()
    )
    act = (
        res[res["ac"] > 0][["district", "am", "ac"]]
        .rename(columns={"am": "m", "ac": "c"})
        .set_index("district")
    )
    sold = (
        res[res["sc"] > 0][["district", "sm", "sc"]]
        .rename(columns={"sm": "m", "sc": "c"})
        .set_index("district")
    )
    return act, sold


def price_ratings(
    listings: ray.data.Dataset, now: str = "2024-07-01"
) -> pd.DataFrame:
    """J6: the district sold-median table is computed with a distributed
    groupby (district_analysis_tables_ds) and only that tiny result is
    broadcast against the listings Dataset; emit ratio + band per rateable
    listing."""
    import ray

    _, sold = district_analysis_tables_ds(listings, now)
    med = sold["m"]
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
    198-423): filter the delta with the vectorized F4 mask, broadcast the
    (tiny, distributed-computed) district analysis tables, render one
    message per surviving listing (rendering is per-row by nature — the
    loop runs over the output-sized survivor set only)."""
    import ray

    tables = district_analysis_tables_ds(listings, now)
    ref = ray.put(tables)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        act, sold = ray.get(ref)
        keep_mask = allowed_mask(pa.Table.from_pandas(df), f).to_numpy(
            zero_copy_only=False
        )
        keep = df[keep_mask].to_dict("records")
        return pd.DataFrame(
            {
                "url": [r["url"] for r in keep],
                "message": [render_new_property_message(r, act, sold) for r in keep],
            }
        )

    out = listings.map_batches(fn, batch_format="pandas").to_pandas()
    return out.sort_values("url").reset_index(drop=True)
