"""Property analytics over the listings/store table — the reference's own
SQL shapes (A1-A4, A7, A9) as Dataset ops, oracle-checked in tests against
the reference's *literal* SQL (translated SQLite→DuckDB) on the same rows
(SURVEY.md §5.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .analytics import r2


def property_stats(listings: ray.data.Dataset) -> pd.DataFrame:
    """A1 (database.go:202-287): per-status partial aggregates then the
    count-weighted final combine. Matches the CTE semantics: rows need
    price NOT NULL; days_to_sell only when both dates present; averages
    weighted by status counts; ROUND() on the two money outputs."""
    from ray.data.aggregate import Count, Mean

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["price"].notna()].copy()
        la = df["living_area"].astype("float64")
        la[la == 0] = np.nan
        df["psqm"] = df["price"] / la
        ld = pd.to_datetime(df["listing_date"], errors="coerce")
        sd = pd.to_datetime(df["selling_date"], errors="coerce")
        df["days_to_sell"] = (sd - ld).dt.days.astype("float64")
        return df[["status", "price", "psqm", "days_to_sell"]]

    agg = (
        listings.map_batches(prep, batch_format="pandas")
        .groupby("status")
        .aggregate(
            Count(alias_name="n"),
            Mean("price", alias_name="avg_price"),
            Mean("psqm", alias_name="avg_psqm"),
            Mean("days_to_sell", alias_name="avg_days"),
        )
        .to_pandas()
        .set_index("status")
    )

    def row(status, col, default=0.0):
        return float(agg.loc[status, col]) if status in agg.index and not pd.isna(
            agg.loc[status, col]
        ) else default

    n_a = int(agg.loc["active", "n"]) if "active" in agg.index else 0
    n_s = int(agg.loc["sold", "n"]) if "sold" in agg.index else 0
    total = n_a + n_s
    avg_price = (
        (row("active", "avg_price") * n_a + row("sold", "avg_price") * n_s) / total
        if total else 0.0
    )
    psqm = (
        (row("active", "avg_psqm") * n_a + row("sold", "avg_psqm") * n_s) / total
        if total else 0.0
    )
    return pd.DataFrame(
        [
            {
                "total_properties": total,
                "average_price": float(r2(avg_price, 0)),
                "price_per_sqm": float(r2(psqm, 0)),
                "avg_days_to_sell": float(r2(row("sold", "avg_days"), 6)),
                "total_sold": n_s,
                "total_active": n_a,
            }
        ]
    )


# The reference SQL (database.go:202-287), SQLite→DuckDB translated:
# julianday difference → date_diff('day'), CURRENT_TIMESTAMP params removed
# (no date-range filter in the test), ROUND() kept.
PROPERTY_STATS_REFERENCE_SQL = """
WITH price_data AS (
    SELECT price, living_area, status,
           CASE WHEN listing_date IS NOT NULL AND selling_date IS NOT NULL
                THEN date_diff('day', CAST(listing_date AS DATE),
                               CAST(selling_date AS DATE))
           END AS days_to_sell
    FROM listings
    WHERE price IS NOT NULL
),
active_stats AS (
    SELECT COUNT(*) AS active_count,
           COALESCE(AVG(price), 0) AS active_avg_price,
           COALESCE(AVG(CAST(price AS DOUBLE) / NULLIF(living_area, 0)), 0)
             AS active_price_per_sqm
    FROM price_data WHERE status = 'active'
),
sold_stats AS (
    SELECT COUNT(*) AS sold_count,
           COALESCE(AVG(price), 0) AS sold_avg_price,
           COALESCE(AVG(days_to_sell), 0) AS avg_days_to_sell,
           COALESCE(AVG(CAST(price AS DOUBLE) / NULLIF(living_area, 0)), 0)
             AS sold_price_per_sqm
    FROM price_data WHERE status = 'sold'
)
SELECT
    COALESCE(active_count + sold_count, 0) AS total_properties,
    CASE WHEN (active_count + sold_count) > 0
         THEN ROUND(COALESCE(((active_avg_price * active_count)
              + (sold_avg_price * sold_count))
              / NULLIF((active_count + sold_count), 0), 0))
         ELSE 0 END AS average_price,
    CASE WHEN (active_count + sold_count) > 0
         THEN ROUND(COALESCE(((active_price_per_sqm * active_count)
              + (sold_price_per_sqm * sold_count))
              / NULLIF((active_count + sold_count), 0), 0))
         ELSE 0 END AS price_per_sqm,
    COALESCE(avg_days_to_sell, 0) AS avg_days_to_sell,
    COALESCE(sold_count, 0) AS total_sold,
    COALESCE(active_count, 0) AS total_active
FROM active_stats, sold_stats
"""


def district_median_psqm(listings: ray.data.Dataset, now: str = "2024-07-01") -> pd.DataFrame:
    """A3 (database.go:1216-1249): exact 1-or-2-middle median €/m² per
    district over sold rows in the trailing year."""
    cutoff = (pd.Timestamp(now) - pd.DateOffset(years=1)).strftime("%Y-%m-%d")

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ok = (
            df["price"].notna() & (df["price"] > 0)
            & df["living_area"].notna() & (df["living_area"] > 0)
            & df["selling_date"].notna() & (df["selling_date"] >= cutoff)
        )
        df = df[ok].copy()
        df["district"] = df["postal_code"].str.slice(0, 4)
        df["psqm"] = df["price"].astype(float) / df["living_area"].astype(float)
        return df[["district", "psqm"]]

    def med(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {
                    "district": g["district"].iloc[0],
                    "median_price_per_sqm": float(r2(np.median(g["psqm"].to_numpy()), 4)),
                    "n": len(g),
                }
            ]
        )

    return (
        listings.map_batches(prep, batch_format="pandas")
        .groupby("district")
        .map_groups(med, batch_format="pandas")
        .to_pandas()
    )


def district_median_reference_sql(now: str = "2024-07-01") -> str:
    """database.go:1216-1249 translated: the classic LIMIT 2-(COUNT%2)
    OFFSET (COUNT-1)/2 exact median, parameterized per district — expressed
    for all districts at once with median(), which is equivalent for the
    1-or-2-middle definition on doubles."""
    # SQLite 'CAST(... AS FLOAT)' is an 8-byte REAL; DuckDB FLOAT is 4-byte,
    # so the faithful translation is DOUBLE
    return f"""
WITH prices_per_sqm AS (
    SELECT substr(postal_code, 1, 4) AS district,
           CAST(price AS DOUBLE) / CAST(living_area AS DOUBLE) AS price_per_sqm
    FROM listings
    WHERE price > 0 AND living_area > 0
      AND selling_date IS NOT NULL
      AND CAST(selling_date AS DATE) >= CAST('{now}' AS DATE) - INTERVAL 1 YEAR
)
SELECT district, ROUND(median(price_per_sqm), 4) AS median_price_per_sqm,
       COUNT(*)::BIGINT AS n
FROM prices_per_sqm GROUP BY 1
"""


def district_price_stats(listings: ray.data.Dataset) -> pd.DataFrame:
    """A7/A9/A2 over the store (PropertyCharts.tsx:169-180, 236-241):
    per-district count, mean/median price, mean/median €/m², sorted by
    average price descending."""

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["price"].notna() & df["postal_code"].notna()].copy()
        df["district"] = df["postal_code"].str.slice(0, 4)
        la = df["living_area"].astype("float64")
        la[la == 0] = np.nan
        df["psqm"] = df["price"] / la
        return df[["district", "price", "psqm"]]

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        p = g["price"].to_numpy(dtype=float)
        q = g["psqm"].dropna().to_numpy(dtype=float)
        return pd.DataFrame(
            [
                {
                    "district": g["district"].iloc[0],
                    "n": len(p),
                    "avg_price": float(r2(p.mean())),
                    "median_price": float(r2(np.median(p))),
                    "avg_psqm": float(r2(q.mean())) if len(q) else None,
                    "median_psqm": float(r2(np.median(q))) if len(q) else None,
                }
            ]
        )

    return (
        listings.map_batches(prep, batch_format="pandas")
        .groupby("district")
        .map_groups(agg, batch_format="pandas")
        .to_pandas()
        .sort_values("avg_price", ascending=False)
        .reset_index(drop=True)
    )
