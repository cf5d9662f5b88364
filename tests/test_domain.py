"""Domain operators: geometry hulls, notification filters/ratings, keyed
cache, city normalization, refresh pass."""

import numpy as np
import pandas as pd
import pytest

from fundamental_ray.ops.geometry import (
    buffer_hull,
    convex_hull,
    district_hulls,
    metro_centers,
)
from fundamental_ray.ops.notify import (
    NotifyFilters,
    district_sold_median,
    is_property_allowed,
    price_ratings,
    rate,
)
from fundamental_ray.crawl.seeds import MetroArea, normalize_city, seed_chains
from fundamental_ray.state.kvcache import KeyedCacheActor


def test_convex_hull_known_square():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.8]])
    h = convex_hull(pts)
    assert len(h) == 4
    assert {tuple(p) for p in h} == {(0, 0), (1, 0), (1, 1), (0, 1)}
    b = buffer_hull(h, 0.001)
    # round joins: each 90° corner contributes a quad_segs(=8)-segment arc
    assert (np.abs(b).max() > 1.0) and len(b) == 4 * 9
    # shapely-buffer invariant: every ring vertex lies exactly `radius`
    # from its nearest hull vertex (round joins of a convex ring)
    d = np.min(np.linalg.norm(b[:, None, :] - h[None, :, :], axis=2), axis=1)
    assert np.allclose(d, 0.001, atol=1e-12)


def _signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def test_buffer_hull_properties():
    """Shapely round-join semantics: convex, CCW, contains the originals,
    arc spacing ≤ π/2/quad_segs; degenerate inputs → circle / capsule."""
    rng = [(0.0, 0.0), (2.0, 0.3), (2.5, 1.7), (1.0, 2.2), (-0.4, 1.0)]
    h = convex_hull(np.array(rng))
    r = 0.05
    b = buffer_hull(h, r)
    assert _signed_area(b) > 0  # CCW
    # convexity: every cross product of consecutive edges ≥ 0
    e = np.roll(b, -1, axis=0) - b
    crosses = e[:, 0] * np.roll(e, -1, axis=0)[:, 1] - e[:, 1] * np.roll(e, -1, axis=0)[:, 0]
    assert (crosses >= -1e-12).all()
    # each original vertex strictly inside (min distance to ring ≥ r - eps)
    for p in h:
        assert np.min(np.linalg.norm(b - p, axis=1)) >= r - 1e-9

    # degenerate: single point → circle of 32 points at radius r
    c = buffer_hull(np.array([[1.0, 1.0]]), r)
    assert len(c) == 32 and np.allclose(np.linalg.norm(c - [1.0, 1.0], axis=1), r)
    # two points → capsule: all vertices at distance r from the segment
    cap = buffer_hull(np.array([[0.0, 0.0], [1.0, 0.0]]), r)
    dist = np.minimum(
        np.linalg.norm(cap - [0.0, 0.0], axis=1), np.linalg.norm(cap - [1.0, 0.0], axis=1)
    )
    on_side = (cap[:, 0] >= 0) & (cap[:, 0] <= 1)
    dist = np.where(on_side, np.minimum(dist, np.abs(cap[:, 1])), dist)
    assert np.allclose(dist, r, atol=1e-12)


def _fake_listings(n=60):
    rows = []
    for i in range(n):
        rows.append(
            {
                "url": f"https://x/detail/koop/a/h-{i}/",
                "postal_code": f"10{i % 3}2 AB",
                "city": ["Amsterdam", "Utrecht"][i % 2],
                "price": 200_000 + i * 1_000,
                "living_area": 50 + i % 40,
                "num_rooms": 1 + i % 5,
                "status": "sold" if i % 2 else "active",
                "selling_date": "2024-03-01" if i % 2 else None,
                "energy_label": ["A", "B", "C"][i % 3],
            }
        )
    return pd.DataFrame(rows)


def test_district_hulls_geojson(ray_session):
    fc = district_hulls(_fake_listings())
    assert fc["type"] == "FeatureCollection"
    assert fc["metadata"]["district_count"] == 3
    for f in fc["features"]:
        ring = f["geometry"]["coordinates"][0]
        assert ring[0] == ring[-1] and len(ring) >= 4


def test_metro_centers():
    mc = metro_centers(_fake_listings())
    assert set(mc["city"]) == {"Amsterdam", "Utrecht"}
    assert (mc["n"] == 30).all()


def test_notify_filter_semantics():
    f = NotifyFilters(min_price=100_000, max_price=300_000, districts=["1002"],
                      energy_labels=["A", "B"])
    ok = {"price": 200_000, "postal_code": "1002 AB", "energy_label": "A"}
    assert is_property_allowed(ok, f)
    # Go Property.Price is non-pointer: missing price reads as 0 → fails min
    assert not is_property_allowed({**ok, "price": None}, f)
    assert not is_property_allowed({**ok, "price": 400_000}, f)
    assert not is_property_allowed({**ok, "postal_code": "9999 ZZ"}, f)
    assert not is_property_allowed({**ok, "energy_label": "G"}, f)
    # …and a max-only price filter PASSES a missing price (0 ≤ max)
    assert is_property_allowed({**ok, "price": None}, NotifyFilters(max_price=300_000))
    # pointer-typed fields (living_area) still reject when missing + bound
    assert not is_property_allowed(ok, NotifyFilters(min_living_area=10))
    # no bounds configured ⇒ everything passes
    assert is_property_allowed({"price": None}, NotifyFilters())


def test_rating_bands():
    # telegram.go:87-99 literal labels
    assert rate(0.7) == "GREAT"
    assert rate(0.80) == "GREAT"
    assert rate(0.81) == "GOOD"
    assert rate(1.0) == "NORMAL"
    assert rate(1.1) == "BAD"
    assert rate(1.5) == "HORRIBLE"


def test_price_ratings(ray_session):
    import ray.data

    pdf = _fake_listings()
    med = district_sold_median(pdf)
    assert len(med) == 3
    out = price_ratings(ray.data.from_pandas(pdf))
    assert set(out["rating"]) <= {"GREAT", "GOOD", "NORMAL", "BAD", "HORRIBLE"}
    # spot-check one ratio against the median table
    r = out.iloc[0]
    expect = (
        pdf.set_index("url").loc[r["url"], "price"]
        / pdf.set_index("url").loc[r["url"], "living_area"]
        / med[r["district"]]
    )
    assert abs(r["ratio"] - round(expect, 4)) < 1e-9


def test_keyed_cache_rate_limit():
    c = KeyedCacheActor(rate_per_sec=1.0, burst=1.0)
    v, s = c.get_or_compute("a", 1)
    assert (v, s) == (1, "computed")
    v, s = c.get_or_compute("a", 999)
    assert (v, s) == (1, "hit")  # cached value wins
    v, s = c.get_or_compute("b", 2)
    assert s == "rate_limited"  # bucket empty until the clock advances
    c.advance(1.0)
    v, s = c.get_or_compute("b", 2)
    assert (v, s) == (2, "computed")
    assert c.stats()["rejected"] == 1


def test_kvcache_snapshot_roundtrip(tmp_path):
    c = KeyedCacheActor()
    c.get_or_compute("k", [1.0, 2.0])
    p = str(tmp_path / "cache.json")
    assert c.snapshot(p) == 1
    c2 = KeyedCacheActor()
    assert c2.restore(p) == 1
    assert c2.get_or_compute("k", None)[1] == "hit"


def test_normalize_city():
    assert normalize_city("'s-Hertogenbosch") == "den-bosch"
    assert normalize_city("Den  Haag") == "den-haag"
    assert normalize_city("'t Gooi") == "t-gooi"
    assert normalize_city("Amsterdam") == "amsterdam"


def test_seed_chains_expansion():
    areas = [MetroArea("Randstad", ["Amsterdam", "Den Haag"]),
             MetroArea("Brabant", ["'s-Hertogenbosch", "Amsterdam"])]
    chains = seed_chains(areas)
    places = {c.place for c in chains}
    assert places == {"amsterdam", "den-haag", "den-bosch"}
    assert len(chains) == 6  # (active, sold) per unique city
    assert all(c.next_url.startswith("https://www.funda.nl/zoeken/koop/?") for c in chains)


def test_refresh_collect_and_mark_inactive(crawl_env):
    """Refresh pass collects exactly the chain's listed URLs (looser /koop/
    predicate) and drives the store's mark-inactive anti-join."""
    import ray.data

    from fundamental_ray.crawl.refresh import refresh_collect
    from fundamental_ray.store.merge import mark_inactive, merge_round
    from fundamental_ray.synth.corpus import chain_pages, make_chains
    from fundamental_ray.crawl.frontier import chains_from_corpus

    corpus, idx = crawl_env
    chains = [c for c in make_chains(4, n_hosts=4) if c.mode == "active"]
    states = chains_from_corpus(chains)
    collected = refresh_collect(idx, states)
    for c in chains:
        truth = set()
        for spec in chain_pages(c):
            truth |= {l.url for l in spec.listings}
        # refresh also picks up the /koop/ map noise link (looser predicate)
        extra = {u for u in collected[c.chain_id] if "/detail/koop/" not in u}
        assert {u for u in collected[c.chain_id] if "/detail/koop/" in u} == truth
        assert all("/koop/" in u for u in extra)

    # wire into the store: one listing vanishes from the refresh → inactive
    c0 = chains[0]
    urls = sorted({l.url for s in chain_pages(c0) for l in s.listings})[:5]
    store = merge_round(
        None,
        ray.data.from_items(
            [{"url": u, "status": "active", "city": c0.place.capitalize(),
              "price": 1, "living_area": 1} for u in urls]
        ),
        1,
    ).materialize()
    active = collected[c0.chain_id] - {urls[0]}
    store2 = mark_inactive(store, c0.place.capitalize(), active, 2)
    df = store2.to_pandas().set_index("url")
    assert df.loc[urls[0], "status"] == "inactive"
    assert (df.drop(index=urls[0])["status"] == "active").all()


def test_pipeline_compose(ray_session):
    """§2.12: priority-ordered declarative stage chain (the ITEM_PIPELINES
    analogue) applies stages in ascending priority."""
    import pyarrow as pa
    import ray.data

    from fundamental_ray.pipelines.compose import PipelineConfig, run_pipeline

    def double(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(0, "x", pc.multiply(t["x"], 2))

    def add_one(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(0, "x", pc.add(t["x"], 1))

    cfg = PipelineConfig()
    cfg.add("add", 900, add_one)   # runs second
    cfg.add("double", 300, double)  # runs first (lower priority number)
    ds = ray.data.from_items([{"x": 1}, {"x": 2}])
    out = sorted(r["x"] for r in run_pipeline(ds, cfg).take_all())
    assert out == [3, 5]  # (x*2)+1, not (x+1)*2


def test_jsonl_wire_format_sink(ray_session, tmp_path, crawl_env):
    """S5: the JSON-lines sink emits the reference's exact wire shape —
    one sparse item per line (None fields dropped, ints as ints,
    pipelines.py:54-69) plus the complete trailer (pipelines.py:71-81)."""
    import json

    import ray.data

    from fundamental_ray.sources.jsonl_sink import write_items_jsonl

    rows = [
        {"url": "https://x/detail/koop/a/h-1/", "price": 100000.0,
         "street": "A 1", "num_rooms": None, "status": "active",
         "scraped_at": "2024-07-01T00:00:00"},
        {"url": "https://x/detail/koop/a/h-2/", "price": None,
         "street": None, "num_rooms": 3.0, "status": "sold",
         "scraped_at": "2024-07-01T00:00:00"},
    ]
    p = str(tmp_path / "items.jsonl")
    n = write_items_jsonl(ray.data.from_items(rows), p)
    lines = [json.loads(l) for l in open(p)]
    assert n == 2 and len(lines) == 3
    items = [l for l in lines if l["type"] == "items"]
    by_url = {l["data"][0]["url"]: l["data"][0] for l in items}
    a = by_url["https://x/detail/koop/a/h-1/"]
    assert a["price"] == 100000 and isinstance(a["price"], int)
    assert "num_rooms" not in a  # None dropped (sparse wire format)
    b = by_url["https://x/detail/koop/a/h-2/"]
    assert "price" not in b and b["num_rooms"] == 3
    trailer = lines[-1]
    assert trailer["type"] == "complete"
    assert trailer["data"]["total_items"] == 2
    assert trailer["data"]["status"] == "success"


def test_format_number_go_parity():
    from fundamental_ray.ops.notify import format_number

    assert format_number(1234567.0) == "1,234,567"
    assert format_number(999.0) == "999"
    assert format_number(1000.0) == "1,000"
    assert format_number(248156.4) == "248,156"
    assert format_number(2.5) == "2"  # Go %.0f rounds half-even
    assert format_number(3.5) == "4"


def test_render_message_republished_and_fallbacks():
    """telegram.go:337-368 republished titles + previous-price delta line;
    missing postal → 'N/A (price analysis unavailable)' + 'Unknown'."""
    import pandas as pd

    from fundamental_ray.ops.notify import render_new_property_message

    act = pd.DataFrame({"district": [], "m": [], "c": []}).set_index("district")
    sold = act.copy()
    base = {
        "url": "https://x/detail/koop/a/h-1/", "street": "S 1", "city": "A",
        "postal_code": "1012 AB", "price": 300_000, "living_area": 100,
        "year_built": None, "num_rooms": 3, "energy_label": "A",
        "status": "republished", "republish_count": 2,
    }
    msg = render_new_property_message(base, act, sold, previous_price=250_000)
    assert "<b>⚡ Property Republished! (2 times)</b>" in msg
    assert "💰 €300,000 (📈 +20.0% from €250,000)" in msg
    assert "🏗️ Built: N/A" in msg and "🚪 Rooms: 3" in msg
    # district exists in neither table → zero-count branches
    assert "Current listings (0 properties):\nNo active listings for comparison" in msg
    assert "Past year sales (0 properties):\nNo recent sales for comparison" in msg

    one = render_new_property_message({**base, "republish_count": 1,
                                       "price": 200_000}, act, sold,
                                      previous_price=250_000)
    assert "<b>⚡ Property Republished!</b>" in one
    assert "(📉 -20.0% from €250,000)" in one

    nopc = render_new_property_message({**base, "status": "active",
                                        "postal_code": None}, act, sold)
    assert "<b>New Property Listed!</b>" in nopc
    assert "📍 A, Unknown" in nopc
    assert "N/A (price analysis unavailable)" in nopc
