"""Property-store state machine vs an imperative oracle transcribed from the
reference's upsert transaction (database.go:766-915), mark-inactive
(database.go:1252-1323) and previous-price (database.go:1420-1438)."""

import hashlib

import pandas as pd
import pytest
import ray.data

from fundamental_ray.store.merge import (
    history_delta,
    mark_inactive,
    merge_round,
    previous_price,
)

FIELDS = [
    "url", "street", "neighborhood", "property_type", "city", "postal_code",
    "price", "year_built", "living_area", "num_rooms", "status",
    "listing_date", "selling_date", "energy_label", "scraped_at",
]


class OracleStore:
    """Row-at-a-time re-statement of the Go upsert semantics."""

    def __init__(self):
        self.rows: dict[str, dict] = {}
        self.history: list[dict] = []

    def insert_properties(self, props: list[dict], round_no: int):
        for p in props:
            p = dict(p)
            la = p.get("living_area")
            p["living_area"] = la if la is not None and la > 0 else None
            cur = self.rows.get(p["url"])
            if cur is not None:
                rc = cur["republish_count"]
                if cur["status"] == "inactive" and p.get("status") == "active":
                    p["status"] = "republished"
                    rc += 1
                p["republish_count"] = rc
                p["first_seen_round"] = cur["first_seen_round"]
            else:
                p["republish_count"] = 0
                p["first_seen_round"] = round_no
            p["last_updated_round"] = round_no
            self.rows[p["url"]] = {k: p.get(k) for k in FIELDS} | {
                k: p[k] for k in ("republish_count", "first_seen_round", "last_updated_round")
            }
            self.history.append(
                {
                    "url": p["url"], "status": p["status"], "price": p.get("price"),
                    "listing_date": p.get("listing_date"), "round": round_no,
                }
            )

    def mark_inactive(self, city: str, active_urls: set[str], round_no: int):
        for r in self.rows.values():
            if (
                (r.get("city") or "").lower() == city.lower()
                and r["status"] == "active"
                and r["url"] not in active_urls
            ):
                r["status"] = "inactive"
                r["last_updated_round"] = round_no

    def previous_price(self, url: str):
        h = [x for x in self.history if x["url"] == url]
        h.sort(key=lambda x: (x["listing_date"] or "", x["round"]), reverse=True)
        return h[1]["price"] if len(h) > 1 else None


def _row(url, status="active", price=100, city="Amsterdam", **kw):
    base = dict.fromkeys(FIELDS)
    base.update(url=url, status=status, price=price, city=city,
                listing_date="2024-01-01", scraped_at="2024-01-01T00:00:00")
    base.update(kw)
    return base


def _ray_store_df(store):
    df = store.to_pandas().sort_values("url").reset_index(drop=True)
    return df


def _check_equal(store, oracle: OracleStore):
    got = _ray_store_df(store)
    want = (
        pd.DataFrame(sorted(oracle.rows.values(), key=lambda r: r["url"]))
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for col in want.columns:
        a, b = got[col], want[col]
        neq = ~((a == b) | (a.isna() & pd.Series(b).isna()))
        assert not neq.any(), (col, got[neq][["url", col]], want[neq][["url", col]])


def test_state_machine_scenario(ray_session):
    """FIXTURES.md §5: insert → inactive → republished → sold, with history
    and previous-price lookups along the way."""
    oracle = OracleStore()
    store = None
    history = []

    # round 1: X and Y inserted active
    d1 = [_row("X", price=100), _row("Y", price=200)]
    store = merge_round(store, ray.data.from_items(d1), 1).materialize()
    oracle.insert_properties(d1, 1)
    history.append(history_delta(store, 1).to_pandas())
    _check_equal(store, oracle)
    df = _ray_store_df(store)
    assert set(df["status"]) == {"active"} and set(df["republish_count"]) == {0}

    # round 2: refresh — X absent from the active URL set → inactive
    store = mark_inactive(store, "Amsterdam", {"Y"}, 2).materialize()
    oracle.mark_inactive("Amsterdam", {"Y"}, 2)
    _check_equal(store, oracle)
    assert _ray_store_df(store).set_index("url").loc["X", "status"] == "inactive"

    # round 3: X reappears active → republished, count 1
    d3 = [_row("X", price=110, listing_date="2024-03-01")]
    store = merge_round(store, ray.data.from_items(d3), 3).materialize()
    oracle.insert_properties(d3, 3)
    history.append(history_delta(store, 3).to_pandas())
    _check_equal(store, oracle)
    row = _ray_store_df(store).set_index("url").loc["X"]
    assert row["status"] == "republished" and row["republish_count"] == 1

    # round 4: X sold
    d4 = [_row("X", status="sold", price=115, listing_date="2024-03-01",
               selling_date="2024-04-01")]
    store = merge_round(store, ray.data.from_items(d4), 4).materialize()
    oracle.insert_properties(d4, 4)
    history.append(history_delta(store, 4).to_pandas())
    _check_equal(store, oracle)

    # previous price from the history log
    hist_ds = ray.data.from_pandas(pd.concat(history, ignore_index=True))
    prev = previous_price(hist_ds).to_pandas().set_index("url")
    assert prev.loc["X", "previous_price"] == oracle.previous_price("X") == 110
    assert pd.isna(prev.loc["Y", "previous_price"])


def test_living_area_zero_nulled(ray_session):
    store = merge_round(
        None, ray.data.from_items([_row("Z", living_area=0), _row("W", living_area=80)]), 1
    )
    df = _ray_store_df(store).set_index("url")
    assert pd.isna(df.loc["Z", "living_area"]) and df.loc["W", "living_area"] == 80


def test_randomized_rounds_match_oracle(ray_session):
    """Deterministic pseudo-random multi-round fuzz: merges + refreshes."""
    oracle = OracleStore()
    store = None
    urls = [f"u{i}" for i in range(30)]

    def h(*k):
        return int.from_bytes(hashlib.blake2b("|".join(map(str, k)).encode(), digest_size=4).digest(), "big")

    for rnd in range(1, 7):
        delta = []
        for u in urls:
            x = h("pick", rnd, u) % 100
            if x < 40:
                status = "sold" if h("st", rnd, u) % 5 == 0 else "active"
                delta.append(
                    _row(u, status=status, price=100 + h("p", rnd, u) % 50,
                         living_area=(h("a", rnd, u) % 5) * 25,
                         listing_date=f"2024-0{rnd}-01")
                )
        if delta:
            store = merge_round(store, ray.data.from_items(delta), rnd).materialize()
            oracle.insert_properties(delta, rnd)
        if rnd % 2 == 0:
            active = {u for u in urls if h("keep", rnd, u) % 2 == 0}
            store = mark_inactive(store, "Amsterdam", active, rnd).materialize()
            oracle.mark_inactive("Amsterdam", active, rnd)
        _check_equal(store, oracle)


def test_paired_round_two_deltas_deterministic(ray_session):
    """A paired active+sold round can carry TWO delta rows for one url; the
    fold applies them row-at-a-time in status order ('active' then 'sold'),
    so the sold row wins the field update, a republish transition triggered
    by the active row still increments the counter, and BOTH rows append
    history (merge_round_full)."""
    from fundamental_ray.store.merge import merge_round_full

    # round 1: P active, then refreshed away → inactive
    store = merge_round(None, ray.data.from_items([_row("P", price=100)]), 1).materialize()
    store = mark_inactive(store, "Amsterdam", set(), 2).materialize()

    # round 3: paired crawl emits BOTH an active and a sold row for P
    d3 = [
        _row("P", status="active", price=110, listing_date="2024-03-01"),
        _row("P", status="sold", price=115, listing_date="2024-03-01",
             selling_date="2024-04-01"),
    ]
    for perm in (d3, d3[::-1]):  # result must not depend on delta row order
        s3, h3 = merge_round_full(store, ray.data.from_items(list(perm)), 3)
        df = _ray_store_df(s3).set_index("url")
        assert df.loc["P", "status"] == "sold"       # last-in-fold-order wins
        assert df.loc["P", "price"] == 115
        assert df.loc["P", "republish_count"] == 1   # active row's transition
        hist = h3.to_pandas().sort_values("status").reset_index(drop=True)
        assert len(hist) == 2                        # one append per delta row
        assert list(hist["status"]) == ["republished", "sold"]
        assert list(hist["price"]) == [110, 115]


def test_merge_round_full_single_delta_history(ray_session):
    from fundamental_ray.store.merge import merge_round_full

    s1, h1 = merge_round_full(None, ray.data.from_items([_row("A", price=9)]), 1)
    hist = h1.to_pandas()
    assert len(hist) == 1 and hist.iloc[0]["status"] == "active"
    assert hist.iloc[0]["round"] == 1


def test_previous_price_vectorized_matches_oracle(ray_session):
    """previous_price over a multi-url history with null listing_dates."""
    import ray.data as rd

    rows = []
    oracle = OracleStore()
    for rnd, (url, price, ld) in enumerate(
        [("u1", 100, "2024-01-01"), ("u1", 110, "2024-02-01"),
         ("u1", 120, None), ("u2", 50, "2024-01-15"), ("u3", 70, None)],
        start=1,
    ):
        oracle.history.append({"url": url, "status": "active", "price": price,
                               "listing_date": ld, "round": rnd})
        rows.append({"url": url, "status": "active", "price": price,
                     "listing_date": ld, "round": rnd})
    got = previous_price(rd.from_items(rows)).to_pandas().set_index("url")
    for u in ("u1", "u2", "u3"):
        want = oracle.previous_price(u)
        g = got.loc[u, "previous_price"]
        assert (pd.isna(g) and want is None) or g == want, (u, g, want)


def test_migrate_store_adds_geo_columns(ray_session, tmp_path):
    """Schema evolution (database.go:480-584): an old-layout store snapshot
    (no geocode columns) loads, gains the columns with defaults, and keeps
    merging; re-migrating is a no-op."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fundamental_ray.store.merge import STORE_SCHEMA, migrate_store

    old_fields = [f for f in STORE_SCHEMA
                  if f.name not in ("latitude", "longitude", "geocoding_attempted")]
    old = pa.table(
        {f.name: pa.array(["X"] if f.name == "url" else [None], f.type) for f in old_fields}
    )
    path = tmp_path / "old_store.parquet"
    pq.write_table(old, str(path))

    store = migrate_store(ray.data.read_parquet(str(path)))
    df = store.to_pandas()
    assert df.loc[0, "geocoding_attempted"] == 0
    assert pd.isna(df.loc[0, "latitude"]) and pd.isna(df.loc[0, "longitude"])
    # still merges after migration
    merged = merge_round(store, ray.data.from_items([_row("Y")]), 2)
    assert len(merged.to_pandas()) == 2
    # idempotent
    again = migrate_store(store).to_pandas()
    assert list(again.columns) == [f.name for f in STORE_SCHEMA]


def test_geocode_once_never_retried(ray_session):
    """database.go:680-719: every eligible row is attempted exactly once;
    failures are marked attempted and never retried; geocode columns
    survive later field updates."""
    import ray.data

    from fundamental_ray.ops.geocode import (
        GeocoderPool,
        resolve_address,
        update_missing_coordinates,
    )
    from fundamental_ray.store.merge import migrate_store

    rows = [_row(f"u{i}", street=f"S{i}", postal_code="1012 AB") for i in range(40)]
    rows.append(_row("no-postal", street="S", postal_code=None))  # ineligible
    store = migrate_store(merge_round(None, ray.data.from_items(rows), 1))

    pool = GeocoderPool(num_shards=2)
    g1 = update_missing_coordinates(store, pool).materialize()
    df = g1.to_pandas().set_index("url")
    assert df.loc["no-postal", "geocoding_attempted"] == 0
    eligible = df.drop(index="no-postal")
    assert (eligible["geocoding_attempted"] == 1).all()
    # coordinates match the deterministic resolver, incl. failures
    fails = 0
    for u, r in eligible.iterrows():
        want = resolve_address(r["street"], r["postal_code"], r["city"])
        if want is None:
            fails += 1
            assert pd.isna(r["latitude"])
        else:
            assert (r["latitude"], r["longitude"]) == want
    s1 = pool.stats()
    assert s1["misses"] == len(eligible) and s1["elapsed"] == float(len(eligible))

    # second pass: nothing to do — failed rows are NOT retried
    g2 = update_missing_coordinates(g1, pool).materialize()
    s2 = pool.stats()
    assert s2["misses"] == s1["misses"] and s2["hits"] == s1["hits"]
    assert g2.to_pandas().set_index("url").equals(df)

    # a field update (round 2 delta) preserves coords + attempted flag
    upd = merge_round(g1, ray.data.from_items([_row("u0", price=999)]), 2).to_pandas()
    row = upd.set_index("url").loc["u0"]
    assert row["price"] == 999 and row["geocoding_attempted"] == 1
    want = resolve_address("S0", "1012 AB", "Amsterdam")
    if want is not None:
        assert (row["latitude"], row["longitude"]) == want


def test_geocode_cache_hits(ray_session):
    """Shared addresses hit the cache: misses = distinct keys (the 1 req/s
    budget is paid once per address, geocoder.go:105-118)."""
    import ray.data

    from fundamental_ray.ops.geocode import GeocoderPool, update_missing_coordinates
    from fundamental_ray.store.merge import migrate_store

    rows = [_row(f"dup{i}", street="Same Street 1", postal_code="2000 XY")
            for i in range(20)]
    store = migrate_store(merge_round(None, ray.data.from_items(rows), 1))
    pool = GeocoderPool(num_shards=2)
    update_missing_coordinates(store, pool).materialize()
    s = pool.stats()
    assert s["misses"] == 1 and s["hits"] == 19 and s["elapsed"] == 1.0


def test_randomized_paired_rounds_match_oracle(ray_session):
    """Fuzz the vectorized fold against the row-at-a-time oracle with
    OCCASIONAL two-delta urls per round (paired active+sold crawls), folded
    in the engine's deterministic status-asc order."""
    oracle = OracleStore()
    store = None
    urls = [f"p{i}" for i in range(25)]

    def h(*k):
        return int.from_bytes(hashlib.blake2b("|".join(map(str, k)).encode(), digest_size=4).digest(), "big")

    for rnd in range(1, 8):
        delta = []
        for u in urls:
            x = h("pick", rnd, u) % 100
            if x < 35:
                status = "sold" if h("st", rnd, u) % 4 == 0 else "active"
                delta.append(_row(u, status=status, price=100 + h("p", rnd, u) % 50,
                                  listing_date=f"2024-0{rnd}-01"))
                if x < 12:  # paired: second delta in the other status
                    other = "active" if status == "sold" else "sold"
                    delta.append(_row(u, status=other, price=200 + h("p2", rnd, u) % 50,
                                      listing_date=f"2024-0{rnd}-02"))
        if delta:
            # engine order: status ascending within url (active before sold)
            delta_sorted = sorted(delta, key=lambda r: (r["url"], r["status"]))
            store = merge_round(store, ray.data.from_items(delta), rnd).materialize()
            oracle.insert_properties(delta_sorted, rnd)
        if rnd % 3 == 0:
            active = {u for u in urls if h("keep", rnd, u) % 2 == 0}
            store = mark_inactive(store, "Amsterdam", active, rnd).materialize()
            oracle.mark_inactive("Amsterdam", active, rnd)
        _check_equal(store, oracle)
