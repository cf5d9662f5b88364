"""Scheduler cadence (scheduler.go:84-282): slot assignment, the composed
weekly job sequence, and a simulated day driving real store transitions."""

import duckdb
import pandas as pd
import pytest
import ray.data

from fundamental_ray.pipelines.cadence import (
    TIME_SLOTS,
    Job,
    jobs_for_tick,
    schedule_slots,
    simulate_week,
)


def test_schedule_slots_literal():
    """scheduler.go:221-243: midnight slots fill first (Sunday-first), then
    4am, then 8/12/16/20; city i → (day i%7, hour TIME_SLOTS[i//7])."""
    cities = [f"c{i}" for i in range(45)]
    s = schedule_slots(cities).set_index("city")
    assert (s.loc["c0", "day"], s.loc["c0", "hour"]) == (0, 0)   # Sunday 00
    assert (s.loc["c6", "day"], s.loc["c6", "hour"]) == (6, 0)   # Saturday 00
    assert (s.loc["c7", "day"], s.loc["c7", "hour"]) == (0, 4)   # Sunday 04
    assert (s.loc["c41", "day"], s.loc["c41", "hour"]) == (6, 20)
    # only 42 slots exist — extra cities stay unscheduled
    assert pd.isna(s.loc["c42", "day"]) and pd.isna(s.loc["c44", "hour"])


def test_week_composition_order():
    """jobMutex serializes everything; within the midnight tick the Go
    check order is sold → active → refresh; hulls fire on the 00:30 tick."""
    cities = ["a", "b"]
    week = simulate_week(cities)
    day0 = [j for j in week if j.day == 0]
    # first tick (Sunday 00:00): sold for every city, then active, then
    # city 'a' (slot Sunday/0) refreshes
    assert day0[:5] == [
        Job(0, 0, 0, "sold", "a"), Job(0, 0, 0, "sold", "b"),
        Job(0, 0, 0, "active", "a"), Job(0, 0, 0, "active", "b"),
        Job(0, 0, 0, "refresh", "a"),
    ]
    assert day0[5] == Job(0, 0, 30, "hulls", None)
    # hourly active cadence: 24 ticks × 2 cities
    assert sum(1 for j in day0 if j.job_type == "active") == 48
    # sold only at midnight; hulls once per day
    assert sum(1 for j in day0 if j.job_type == "sold") == 2
    assert sum(1 for j in day0 if j.job_type == "hulls") == 1
    # city 'b' refreshes Monday midnight (slot index 1 → day 1, hour 0)
    assert Job(1, 0, 0, "refresh", "b") in week
    # weekly totals
    assert sum(1 for j in week if j.job_type == "refresh") == 2
    assert sum(1 for j in week if j.job_type == "sold") == 2 * 7


def test_simulated_day_drives_store(crawl_env, ray_session):
    """One cadence day against the real engine artifacts: active jobs build
    the store, the midnight sold job merges sold rows, the refresh job
    flips a removed listing inactive, the hull job emits GeoJSON."""
    from fundamental_ray.ops.geometry import district_hulls
    from fundamental_ray.store.merge import mark_inactive, merge_round

    corpus, _ = crawl_env
    con = duckdb.connect()
    gl = con.sql(f"select * from '{corpus}/golden_listings.parquet'").df()
    active = gl[gl["chain_id"] % 2 == 0]
    sold = gl[gl["chain_id"] % 2 == 1]
    drop = ["chain_id", "family"]

    cities = sorted(active["city"].dropna().unique())
    week = simulate_week(cities)
    store = None
    hulls = None
    removed_url = None
    round_no = 0
    for job in (j for j in week if j.day == 0):
        round_no += 1
        if job.job_type == "active":
            delta = active[active["city"] == job.city].drop(columns=drop)
            if len(delta):
                store = merge_round(
                    store, ray.data.from_pandas(delta.reset_index(drop=True)), round_no
                ).materialize()
        elif job.job_type == "sold":
            delta = sold.drop(columns=drop)  # sold chains have their own places
            store = merge_round(
                store, ray.data.from_pandas(delta.reset_index(drop=True)), round_no
            ).materialize()
        elif job.job_type == "refresh":
            city_urls = set(active[active["city"] == job.city]["url"])
            if city_urls:
                removed_url = min(city_urls)
                store = mark_inactive(
                    store, job.city, city_urls - {removed_url}, round_no
                ).materialize()
                flipped = store.to_pandas().set_index("url").loc[removed_url]
                assert flipped["status"] == "inactive"  # J4 took effect
        elif job.job_type == "hulls":
            hulls = district_hulls(store.to_pandas())
        if round_no > 60:  # one midnight block + a few hourly actives suffice
            break

    df = store.to_pandas()
    assert set(df["status"]) >= {"active", "sold"}
    assert hulls is not None and hulls["type"] == "FeatureCollection"
    # the NEXT hourly active job re-listed the removed url (inactive →
    # republished, database.go:786-793); later hourly updates overwrite the
    # status again, but the incremented republish_count records the arc
    if removed_url is not None:
        row = df.set_index("url").loc[removed_url]
        assert row["republish_count"] == 1 and row["status"] == "active"
    # idempotent upsert: re-running an hourly active job for a city the
    # refresh did NOT touch changes nothing
    before = df.sort_values("url").reset_index(drop=True)
    delta = active[active["city"] == cities[-1]].drop(columns=drop)
    store2 = merge_round(
        store, ray.data.from_pandas(delta.reset_index(drop=True)), round_no + 1
    ).materialize()
    after = store2.to_pandas().sort_values("url").reset_index(drop=True)
    changed = (after["status"].fillna("-") != before["status"].fillna("-")) | (
        after["price"].fillna(-1) != before["price"].fillna(-1)
    )
    assert not changed.any()
