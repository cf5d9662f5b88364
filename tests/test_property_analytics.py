"""SURVEY.md §5.3: A1/A3 Dataset implementations cross-checked against the
reference's literal SQL (database.go:202-287, 1216-1249; SQLite→DuckDB
translated) executed over the SAME crawl-produced listings rows."""

import duckdb
import pandas as pd
import pytest
import ray.data

from fundamental_ray.pipelines.property_analytics import (
    PROPERTY_STATS_REFERENCE_SQL,
    district_median_psqm,
    district_median_reference_sql,
    district_price_stats,
    property_stats,
)


@pytest.fixture(scope="module")
def listings_pdf(crawl_env):
    import glob

    corpus, idx = crawl_env
    files = glob.glob("/tmp/fr_test_job_full/round=*/listings_parts/*.parquet")
    if not files:
        pytest.skip("crawl job output not present (run test_crawl first)")
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    return df.drop(columns=["chain_id"])


def _duck(listings: pd.DataFrame):
    con = duckdb.connect()
    con.register("listings", listings)
    return con


def test_property_stats_vs_reference_sql(listings_pdf, ray_session):
    got = property_stats(ray.data.from_pandas(listings_pdf))
    con = _duck(listings_pdf)
    want = con.sql(PROPERTY_STATS_REFERENCE_SQL).df()
    assert int(got["total_properties"][0]) == int(want["total_properties"][0])
    assert int(got["total_sold"][0]) == int(want["total_sold"][0])
    assert int(got["total_active"][0]) == int(want["total_active"][0])
    assert got["average_price"][0] == pytest.approx(float(want["average_price"][0]))
    assert got["price_per_sqm"][0] == pytest.approx(float(want["price_per_sqm"][0]))
    # query side rounds avg_days to 6 dp (r2 export convention)
    assert got["avg_days_to_sell"][0] == pytest.approx(
        float(want["avg_days_to_sell"][0]), abs=5e-7
    )


def test_district_median_vs_reference_sql(listings_pdf, ray_session):
    got = district_median_psqm(ray.data.from_pandas(listings_pdf)).sort_values(
        "district"
    ).reset_index(drop=True)
    con = _duck(listings_pdf)
    want = (
        con.sql(district_median_reference_sql())
        .df()
        .sort_values("district")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_district_price_stats_shape(listings_pdf, ray_session):
    out = district_price_stats(ray.data.from_pandas(listings_pdf))
    assert {"district", "n", "avg_price", "median_price", "avg_psqm", "median_psqm"} <= set(out.columns)
    # sorted by avg price descending (PropertyCharts.tsx:180)
    assert (out["avg_price"].diff().dropna() <= 1e-9).all()
    assert out["n"].sum() == listings_pdf["price"].notna().sum()
