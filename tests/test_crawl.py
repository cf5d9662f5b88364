"""Crawl-semantics conformance (SURVEY.md §5.2/§5.4): the Ray frontier must
reproduce the reference spider's page-visit sequence, per-page counters and
final URL-seen membership (funda_spider.py:84-186 control flow), stay
invariant under politeness budgets, enforce robots, and resume exactly from
the last committed checkpoint."""

import json
import os
import shutil

import duckdb
import pandas as pd
import pytest

from fundamental_ray.crawl.fetchstore import build_fetch_index
from fundamental_ray.crawl.frontier import (
    CrawlConfig,
    CrawlJob,
    chains_from_corpus,
    crawl_listings_dataset,
)
from fundamental_ray.synth.corpus import make_chains
from fundamental_ray.synth.materialize import SCRAPED_AT, materialize_corpus

N_CHAINS = 4


def _run(idx, job_dir, **kw):
    shutil.rmtree(job_dir, ignore_errors=True)
    cfg = CrawlConfig(
        index_dir=idx, job_dir=job_dir, num_seen_shards=4,
        scraped_at=SCRAPED_AT, **kw,
    )
    job = CrawlJob(cfg, chains_from_corpus(make_chains(N_CHAINS, n_hosts=4)))
    counters = job.run()
    return job, counters


def _golden(corpus):
    con = duckdb.connect()
    seen = {
        u for (u,) in con.sql(
            f"select url from '{corpus}/golden_seen_set.parquet'"
        ).fetchall()
    }
    visits = [
        tuple(r)
        for r in con.sql(
            "select chain_id, page_seq, found, new, skipped from "
            f"'{corpus}/golden_frontier_order.parquet' order by 1, 2"
        ).fetchall()
    ]
    return con, seen, visits


def _got_visits(job_dir):
    out = []
    for d in sorted(os.listdir(job_dir)):
        if not d.startswith("round="):
            continue
        with open(os.path.join(job_dir, d, "counters.json")) as fh:
            j = json.load(fh)
        for cid, pv in j["page_visits"].items():
            if pv["visited"]:
                out.append(
                    (int(cid), j["round"], pv["found"], pv["new"], pv["found"] - pv["new"])
                )
    return sorted(out)


def test_crawl_matches_reference_simulation(crawl_env):
    corpus, idx = crawl_env
    job, counters = _run(idx, "/tmp/fr_test_job_full", budget_per_host=1000)
    con, g_seen, g_visits = _golden(corpus)

    assert job.seen.all_urls() == g_seen, "final URL-seen membership must match"
    assert _got_visits("/tmp/fr_test_job_full") == g_visits, "page-visit sequence"

    # listings delta union must be byte-identical to the analytic goldens
    ld = crawl_listings_dataset("/tmp/fr_test_job_full").to_pandas()
    gl = con.sql(f"select * from '{corpus}/golden_listings.parquet'").df()
    assert len(ld) == len(gl)
    merged = gl.merge(ld, on="url", suffixes=("_g", "_x"))
    assert len(merged) == len(gl)
    for f in [
        "street", "neighborhood", "property_type", "city", "postal_code",
        "price", "year_built", "living_area", "num_rooms", "status",
        "listing_date", "selling_date", "energy_label", "scraped_at",
    ]:
        a, b = merged[f + "_g"], merged[f + "_x"]
        neq = ~((a == b) | (a.isna() & b.isna()))
        assert not neq.any(), (f, merged.loc[neq, ["url", f + "_g", f + "_x"]].head())

    assert counters["blocked"] > 0  # family F pages were claimed then dropped
    assert counters["deduped"] > 0  # pagination overlap was deduped


def test_politeness_budget_invariance(crawl_env):
    """Throttling defers fetches across rounds but never changes the final
    membership or listings (reference: delay changes timing, not results)."""
    corpus, idx = crawl_env
    _, g_seen, _ = _golden(corpus)
    job, counters = _run(idx, "/tmp/fr_test_job_b5", budget_per_host=5)
    assert counters["deferred"] > 0
    assert job.seen.all_urls() == g_seen
    full = crawl_listings_dataset("/tmp/fr_test_job_full").to_pandas()
    got = crawl_listings_dataset("/tmp/fr_test_job_b5").to_pandas()
    assert set(got["url"]) == set(full["url"])


def test_robots_enforcement(crawl_env):
    corpus, idx = crawl_env
    rows = [("www.funda.nl", "User-agent: *\nDisallow: /detail/\n")]
    job, counters = _run(
        idx, "/tmp/fr_test_job_robots", budget_per_host=1000,
        obey_robots=True, robots_rows=rows,
    )
    assert counters["robots_denied"] > 0
    ld = crawl_listings_dataset("/tmp/fr_test_job_robots").to_pandas()
    assert not ld["url"].str.contains("www.funda.nl").any()
    # denied URLs are still *claimed* (seen) — they were deduped before the
    # gate, mirroring claim-before-request
    assert any("www.funda.nl" in u for u in job.seen.all_urls())


def test_checkpoint_resume_exact(crawl_env):
    """Kill after N rounds, resume → identical final state to an
    uninterrupted run (north_rule resumability)."""
    corpus, idx = crawl_env
    _, g_seen, g_visits = _golden(corpus)
    shutil.rmtree("/tmp/fr_test_job_resume", ignore_errors=True)
    cfg = CrawlConfig(
        index_dir=idx, job_dir="/tmp/fr_test_job_resume", num_seen_shards=4,
        scraped_at=SCRAPED_AT, budget_per_host=5, max_rounds=3,
    )
    job = CrawlJob(cfg, chains_from_corpus(make_chains(N_CHAINS, n_hosts=4)))
    job.run()  # stops "mid-crawl" at round 3
    assert job.round == 3

    cfg2 = CrawlConfig(
        index_dir=idx, job_dir="/tmp/fr_test_job_resume", num_seen_shards=4,
        scraped_at=SCRAPED_AT, budget_per_host=5, max_rounds=64,
    )
    job2, deferred = CrawlJob.resume(cfg2)
    assert job2.round == 3
    job2.run(deferred)

    assert job2.seen.all_urls() == g_seen
    assert _got_visits("/tmp/fr_test_job_resume") == g_visits
    full = crawl_listings_dataset("/tmp/fr_test_job_full").to_pandas()
    got = crawl_listings_dataset("/tmp/fr_test_job_resume").to_pandas()
    assert set(got["url"]) == set(full["url"])


def test_cuckoo_filter_and_shards(ray_session):
    from fundamental_ray.crawl.seen import CuckooFilter, SeenSet

    f = CuckooFilter(10_000)
    keys = [f"https://h/x/{i}".encode() for i in range(5_000)]
    for k in keys:
        assert f.insert(k)
    assert all(f.contains(k) for k in keys)  # no false negatives, ever
    fp = sum(f.contains(f"https://h/y/{i}".encode()) for i in range(5_000))
    assert fp < 50  # ~16-bit fingerprints → tiny false-positive rate

    s = SeenSet(num_shards=3)
    urls = [f"https://h/p/{i}" for i in range(1000)]
    first = s.check_and_insert(urls)
    assert all(first)
    second = s.check_and_insert(urls)
    assert not any(second)
    mixed = s.check_and_insert(["https://h/p/1", "https://h/p/new"])
    assert mixed == [False, True]
    assert s.total() == 1001


def test_robots_parsing():
    from fundamental_ray.crawl.robots import parse_robots

    r = parse_robots(
        "User-agent: googlebot\nDisallow: /x\n\n"
        "User-agent: *\nDisallow: /detail/\nAllow: /detail/open/\nCrawl-delay: 10\n"
    )
    assert not r.allowed("/detail/koop/a/")
    assert r.allowed("/detail/open/a")  # longest-prefix Allow wins
    assert r.allowed("/x")  # other-agent group ignored
    assert r.crawl_delay == 10.0


def test_missing_list_page_ends_chain(crawl_env):
    """A list URL absent from the pages table (live crawl: 404) must end the
    chain on that round, with no page-visit recorded for it."""
    corpus, idx = crawl_env
    shutil.rmtree("/tmp/fr_test_job_miss", ignore_errors=True)
    cfg = CrawlConfig(
        index_dir=idx, job_dir="/tmp/fr_test_job_miss", num_seen_shards=2,
        scraped_at=SCRAPED_AT,
    )
    from fundamental_ray.crawl.frontier import ChainState

    ghost = ChainState(
        chain_id=999, host="nosuch.example", place="nergens",
        availability="available",
        next_url="https://nosuch.example/zoeken/koop/?selected_area=%5B%22nergens%22%5D",
    )
    job = CrawlJob(cfg, [ghost])
    job.run()
    assert job.round == 1
    assert job.chains[999].done
    assert job.counters["fetched"] == 0 and job.counters["listings"] == 0
    assert _got_visits("/tmp/fr_test_job_miss") == []


def test_status_partitioned_seen(ray_session):
    """SURVEY §1.2: active and sold crawls hold independent URL-seen
    universes — the same address can be claimed once per class (the
    reference's two spiders would each fetch it), and store preloading
    routes by status exactly like the reference's SELECTs
    (scrapers/funda/database.py:37-51)."""
    from fundamental_ray.crawl.seen import StatusPartitionedSeen

    s = StatusPartitionedSeen(num_shards=2)
    url = "https://www.funda.nl/detail/koop/amsterdam/huis-x-1/"
    assert s.pool("active").check_and_insert([url]) == [True]
    assert s.pool("sold").check_and_insert([url]) == [True]   # independent
    assert s.pool("active").check_and_insert([url]) == [False]
    assert s.pool("sold").check_and_insert([url]) == [False]
    assert s.total() == 2 and s.all_urls() == {url}

    s2 = StatusPartitionedSeen(num_shards=2)
    s2.preload_from_store(
        [("active", "u1"), ("inactive", "u2"), ("republished", "u3"),
         ("sold", "u4"), ("unknown", "u5")]
    )
    by = s2.all_urls_by_class()
    assert by["active"] == {"u1", "u2", "u3"}   # active spider skips these
    assert by["sold"] == {"u4"}                  # sold spider skips only sold
    # u5 (unknown status) is in neither class → both crawls would refetch
    assert s2.pool("active").check_and_insert(["u4"]) == [True]


def test_paired_active_sold_crawl_same_place(ray_session, tmp_path):
    """End-to-end status partitioning: an active and a sold chain over the
    SAME place crawl the SAME detail URLs. Each class claims independently
    (two reference spider runs both fetch the page); every shared URL yields
    one active-parse row and one sold-parse row, each matching the extractor
    applied in that mode."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fundamental_ray.crawl.fetchstore import build_fetch_index
    from fundamental_ray.extraction.listing import extract_listing_row
    from fundamental_ray.synth.corpus import (
        Chain,
        chain_rows,
        simulate_reference_crawl,
        unique_listings,
    )
    from fundamental_ray.synth.materialize import PAGES_SCHEMA, SCRAPED_AT

    active = Chain(0, "www.funda.nl", "parity", "available", "standard")
    sold = Chain(1, "www.funda.nl", "parity", "unavailable", "standard",
                 listing_owner=0)
    assert {l.url for l in unique_listings(active)} == {
        l.url for l in unique_listings(sold)
    }

    rows = chain_rows(active) + chain_rows(sold)
    pq.write_table(
        pa.Table.from_pylist(rows, schema=PAGES_SCHEMA),
        str(tmp_path / "pages.parquet"),
    )
    idx = build_fetch_index(str(tmp_path / "pages.parquet"),
                            str(tmp_path / "idx"), num_buckets=4)
    cfg = CrawlConfig(
        index_dir=idx, job_dir=str(tmp_path / "job"), num_seen_shards=2,
        scraped_at=SCRAPED_AT,
    )
    job = CrawlJob(cfg, chains_from_corpus([active, sold]))
    job.run()

    _, p_active, _ = simulate_reference_crawl(active)
    _, p_sold, _ = simulate_reference_crawl(sold)
    by_class = job.seen.all_urls_by_class()
    assert by_class["active"] == p_active
    assert by_class["sold"] == p_sold
    shared = p_active & p_sold
    assert len(shared) > 30  # sold chain stops earlier, so a subset

    ld = crawl_listings_dataset(str(tmp_path / "job")).to_pandas()
    pages = {r["url"]: r["html"] for r in rows}
    for url in sorted(shared)[:10]:
        got = ld[ld["url"] == url].set_index("status")
        assert set(got.index) == {"active", "sold"}, url
        for mode in ("active", "sold"):
            want = extract_listing_row(
                bytes(pages[url]).decode(), url, "parity", mode, SCRAPED_AT
            )
            for fkey in ("street", "price", "year_built", "living_area",
                         "energy_label", "listing_date", "selling_date"):
                g = got.loc[mode, fkey]
                w = want[fkey]
                assert (g == w) or (pd.isna(g) and w is None), (url, mode, fkey, g, w)


def test_cuckoo_degradation_falls_back_to_exact(ray_session):
    """An over-capacity filter must never re-claim an already-claimed URL:
    on insert failure the shard flips to degraded mode (misses consult the
    exact set) and the evicted victim fingerprint stays findable via the
    stash (ADVICE r1)."""
    from fundamental_ray.crawl.seen import CuckooFilter, SeenShardActor

    shard = SeenShardActor(0, capacity=64)  # tiny filter, overflows fast
    urls = [f"https://h/deg/{i}" for i in range(2_000)]
    first = shard.check_and_insert(urls)
    assert all(first)
    assert shard.filter.degraded  # capacity 64 ≪ 2000 inserts
    # every URL must now report seen — including any whose fingerprint the
    # full filter dropped or stashed
    second = shard.check_and_insert(urls)
    assert not any(second)
    assert all(shard.contains(urls))

    # direct filter check: a failed insert parks the victim in the stash
    f = CuckooFilter(16)
    lost = []
    for i in range(10_000):
        k = f"k{i}".encode()
        if not f.insert(k):
            lost.append(k)
    assert f.degraded and len(f.stash) > 0


def test_schedule_round_dataset_matches_local(ray_session):
    """The Dataset groupby politeness scheduler (the pathological-blow-up
    fallback) must agree exactly with the vectorized driver-local one,
    including Crawl-delay budget shrink."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fundamental_ray.crawl.politeness import schedule_round, schedule_round_local

    rng = np.arange(500)
    hosts = np.array([
        "big.example" if i % 5 == 0 else f"h{i % 7}" for i in range(500)
    ])
    t = pa.table(
        {
            "url": pa.array([f"https://{h}/d/{i}/" for i, h in enumerate(hosts)]),
            "url_norm": pa.array([f"{h}/d/{i}" for i, h in enumerate(hosts)]),
            "host": pa.array(hosts.tolist()),
            "chain_id": pa.array((rng % 11).astype("int64")),
            "mode": pa.array(["active"] * 500),
            "place": pa.array(["x"] * 500),
            "priority": pa.array(((rng * 7) % 3).astype("int32")),
            "page_seq": pa.array((rng % 9).astype("int32")),
            "url_crc": pa.array(rng.astype("uint32")),
        }
    )
    delays = {"big.example": 8.0}
    sched_l, defer_l = schedule_round_local(t, 20, delays, 2.0)
    ds = schedule_round(ray.data.from_arrow(t), 20, delays, 2.0).to_pandas()
    got_sched = set(ds[ds["scheduled"]]["url_norm"])
    got_defer = set(ds[~ds["scheduled"]]["url_norm"])
    assert got_sched == set(sched_l.column("url_norm").to_pylist())
    assert got_defer == set(defer_l.column("url_norm").to_pylist())
    # Crawl-delay shrink: big.example budget = 20 * 2/8 = 5
    big = ds[ds["host"] == "big.example"]
    assert int(big["scheduled"].sum()) == 5


def test_multirun_crawl_with_store_preload(crawl_env):
    """Cross-RUN seen semantics end-to-end (S7/D2): run 1 crawls fresh and
    builds the store; run 2 preloads its seen sets FROM that store (the
    reference's status-dependent SELECTs) and re-crawls the same corpus.
    The second run's page visits and (empty) listings delta must match the
    reference simulator given the same existing-URL sets."""
    import ray.data

    from fundamental_ray.crawl.frontier import round_listings_paths
    from fundamental_ray.store.merge import merge_round
    from fundamental_ray.synth.corpus import simulate_reference_crawl

    corpus, idx = crawl_env
    job1, _ = _run(idx, "/tmp/fr_test_job_mr1", budget_per_host=1000)

    # store built from run 1's listings (insert-only)
    listings = crawl_listings_dataset("/tmp/fr_test_job_mr1")
    store = merge_round(None, listings.drop_columns(["chain_id"]), 1).materialize()
    pdf = store.to_pandas()

    # run 2: fresh job whose seen sets are preloaded from the store —
    # PLUS the blocked urls run 1 claimed but never stored (the reference
    # spider's processed set only persists via the DB rows it inserted, so
    # blocked pages WOULD be re-claimed; the simulator models that too)
    shutil.rmtree("/tmp/fr_test_job_mr2", ignore_errors=True)
    cfg2 = CrawlConfig(
        index_dir=idx, job_dir="/tmp/fr_test_job_mr2", num_seen_shards=4,
        scraped_at=SCRAPED_AT, budget_per_host=1000,
    )
    chains2 = chains_from_corpus(make_chains(N_CHAINS, n_hosts=4))
    job2 = CrawlJob(cfg2, chains2)
    job2.seen.preload_from_store(list(zip(pdf["status"], pdf["url"])))
    job2.run()

    # simulator twin: per chain, existing = store urls its class skips
    by_class = {
        "active": {u for s, u in zip(pdf["status"], pdf["url"])
                   if s in ("active", "inactive", "republished")},
        "sold": {u for s, u in zip(pdf["status"], pdf["url"]) if s == "sold"},
    }
    want_visits = []
    want_new_urls = set()
    for c in make_chains(N_CHAINS, n_hosts=4):
        visits, processed, blocked = simulate_reference_crawl(
            c, existing_urls=frozenset(by_class[c.mode])
        )
        for v in visits:
            want_visits.append((v.chain_id, v.page_seq, v.found, v.new, v.skipped))
        want_new_urls |= processed
    assert _got_visits("/tmp/fr_test_job_mr2") == sorted(want_visits)

    # run 2's novel claims = exactly the urls the store did NOT cover for
    # that class (here: the blocked interstitials run 1 never stored)
    got_new = set()
    import pyarrow.parquet as _pq

    from fundamental_ray.crawl.seen import seen_claims_paths

    for d in sorted(os.listdir("/tmp/fr_test_job_mr2")):
        if d.startswith("round="):
            for p in seen_claims_paths(os.path.join("/tmp/fr_test_job_mr2", d)):
                got_new |= set(_pq.read_table(p).column("url_norm").to_pylist())
    assert got_new == want_new_urls
    assert all(u not in set(pdf["url"]) for u in got_new)  # only unseen urls

    # and their fetches re-hit the blocked interstitial → zero new listings
    assert job2.counters["listings"] == 0
    assert job2.counters["blocked"] == len(got_new)


def test_seen_shard_actor_restart_recovers_membership(crawl_env):
    """Actor-level fault tolerance: kill every seen shard of a finished
    crawl (Ray restarts them with the same args); the restarted shards
    rebuild their membership from the committed claim checkpoints and
    answer claims/contains exactly as before the crash."""
    import ray

    corpus, idx = crawl_env
    _, g_seen, _ = _golden(corpus)
    job, _ = _run(idx, "/tmp/fr_test_job_kill", budget_per_host=1000)
    assert job.seen.all_urls() == g_seen

    # hard-kill every shard actor; restartable actors re-run __init__
    for pool in job.seen.pools.values():
        for sh in pool.shards:
            ray.kill(sh, no_restart=False)
    # restarted shards must have replayed the committed claims
    assert job.seen.all_urls() == g_seen
    some = sorted(g_seen)[:50]
    for pool_name in ("active", "sold"):
        res = job.seen.pools[pool_name].check_and_insert(list(some))
        # urls belonging to this class are still seen; at most the OTHER
        # class's urls claim as novel — union membership is unchanged
    assert job.seen.all_urls() == g_seen | set(some)  # new claims only add


def test_crawl_parity_skewed_corpus(ray_session):
    """Conformance generalizes beyond the fixture corpus: a Zipf-skewed
    2-host corpus (hot-host fan-out, the north rule's skew case) must still
    reproduce the simulator's visits, membership and listings exactly."""
    from fundamental_ray.synth.materialize import materialize_corpus

    corpus = materialize_corpus("sf0.001", n_chains=6, n_hosts=2, zipf_s=1.5)
    idx = build_fetch_index(
        f"{corpus}/pages.parquet", "/tmp/fr_index_skew", num_buckets=8
    )
    shutil.rmtree("/tmp/fr_test_job_skew", ignore_errors=True)
    cfg = CrawlConfig(
        index_dir=idx, job_dir="/tmp/fr_test_job_skew", num_seen_shards=4,
        scraped_at=SCRAPED_AT, budget_per_host=7,  # hot host must defer
    )
    job = CrawlJob(cfg, chains_from_corpus(make_chains(6, n_hosts=2, zipf_s=1.5)))
    counters = job.run()

    con, g_seen, g_visits = _golden(corpus)
    assert job.seen.all_urls() == g_seen
    assert _got_visits("/tmp/fr_test_job_skew") == g_visits
    assert counters["deferred"] > 0  # the skew actually hit the budget
    ld = crawl_listings_dataset("/tmp/fr_test_job_skew").to_pandas()
    gl = con.sql(f"select * from '{corpus}/golden_listings.parquet'").df()
    assert set(ld["url"]) == set(gl["url"]) and len(ld) == len(gl)


# --------------------------------------------------------- round-3 fixes
def test_fresh_job_refuses_dirty_job_dir(crawl_env):
    """A fresh CrawlJob over a dir holding a previous run's committed
    rounds must fail fast — silently replaying the old seen claims would
    dedup everything and emit zero listings with no warning."""
    corpus, idx = crawl_env
    _run(idx, "/tmp/fr_test_job_dirty", budget_per_host=1000)
    cfg = CrawlConfig(
        index_dir=idx, job_dir="/tmp/fr_test_job_dirty", num_seen_shards=4,
        scraped_at=SCRAPED_AT,
    )
    with pytest.raises(ValueError, match="committed round"):
        CrawlJob(cfg, chains_from_corpus(make_chains(N_CHAINS, n_hosts=4)))


def test_preload_idempotent_filter_slots():
    """Re-preloading the same URLs (resume: shards already recovered the
    committed claims in __init__) must not consume second filter slots —
    double insertion would halve effective capacity and flip shards to
    degraded mode early."""
    from fundamental_ray.crawl.seen import SeenShardActor

    sh = SeenShardActor(0)
    urls = [f"https://h.example/x{i}" for i in range(500)]
    sh.preload(urls)
    slots_after_first = sh.filter.count
    sh.preload(urls)
    assert sh.filter.count == slots_after_first
    assert not sh.filter.degraded


def test_shard_crash_claim_repush_window(ray_session, tmp_path):
    """ADVICE window: a shard that dies AFTER returning a round's novel
    rows but restarts BEFORE that round commits loses the in-flight
    claims (_recover replays only _COMMITTED rounds). The next round's
    claim call re-pushes the shard's own previous output, restoring the
    membership before any new claim."""
    import numpy as np
    import pyarrow as pa
    import ray

    from fundamental_ray.crawl.seen import SeenSet

    s = SeenSet(num_shards=1, recovery_base=str(tmp_path / "job"))
    urls = [f"https://h.example/detail/koop/x{i}" for i in range(10)]
    out = {
        "cand": pa.table(
            {"url_norm": pa.array(urls), "mode": pa.array(["active"] * 10)}
        ),
        "route_offsets": np.array([0, 10, 10]),
    }
    ref = ray.put(out)
    shard = s.shards[0]

    def crash_and_wait_restart():
        # ray.kill is async — wait until the restarted incarnation (empty
        # membership after recovering a claim-less job dir) answers
        import time as _t

        ray.kill(shard, no_restart=False)
        for _ in range(200):
            if ray.get(shard.size.remote()) == 0:
                return
            _t.sleep(0.05)
        raise AssertionError("shard did not restart empty")

    novel1 = ray.get(shard.claim_from_outputs.remote([ref], "active", 0, 1, None))
    assert novel1.num_rows == 10

    # crash between claim-return and commit: restart recovers an empty dir
    crash_and_wait_restart()
    # WITHOUT the re-push the restarted shard re-claims everything (the bug)
    redo = ray.get(shard.claim_from_outputs.remote([ref], "active", 0, 1, None))
    assert redo is not None and redo.num_rows == 10

    crash_and_wait_restart()
    # WITH the re-push (driver hands back the uncommitted rounds' claim
    # output refs) the restarted shard recognizes every URL as claimed
    fixed = ray.get(
        shard.claim_from_outputs.remote([ref], "active", 0, 1, [ray.put(novel1)])
    )
    assert fixed is None or fixed.num_rows == 0


def test_transient_retry_simulation(crawl_env):
    """S4 (settings.py:31-32): md5-flaky detail requests fail once with a
    synthetic transient status and succeed on the retry round; membership
    and listings are invariant and `retried` counts exactly the flaky
    claimed URLs. Chains all reach their reference stop conditions."""
    import hashlib

    corpus, idx = crawl_env
    con, g_seen, g_visits = _golden(corpus)
    job, counters = _run(
        idx, "/tmp/fr_test_job_retrysim", budget_per_host=1000,
        simulate_transient=True,
    )
    assert counters["retried"] > 0
    expected = sum(
        1 for u in g_seen
        if int(hashlib.md5(u.encode()).hexdigest()[:2], 16) % 7 == 0
    )
    assert counters["retried"] == expected
    assert job.seen.all_urls() == g_seen
    assert all(c.done for c in job.chains.values())  # chain-end reached
    # page-visit contract unchanged — retries touch detail fetches only
    assert _got_visits("/tmp/fr_test_job_retrysim") == g_visits
    got = crawl_listings_dataset("/tmp/fr_test_job_retrysim").to_pandas()
    n_golden = con.sql(
        f"select count(*) from '{corpus}/golden_listings.parquet'"
    ).fetchone()[0]
    assert len(got) == n_golden


def test_robots_mask_matches_scalar():
    """Vectorized robots gate ≡ per-URL scalar semantics."""
    import numpy as np

    from fundamental_ray.crawl.robots import RobotsTable

    rt = RobotsTable.from_rows(
        [
            ("a.example", "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"),
            ("b.example", "User-agent: *\nDisallow: /\n"),
        ]
    )
    urls = [
        "https://a.example/private/x",
        "https://a.example/private/ok/y",
        "https://a.example/pub?page=2",
        "https://a.example/",
        "https://b.example/anything",
        "https://c.example/free",
        "https://c.example",
    ]
    hosts = [u.split("/")[2] for u in urls]
    got = rt.allowed_mask(np.array(hosts, dtype=object), np.array(urls, dtype=object))
    want = np.array([rt.allowed(u) for u in urls])
    assert (got == want).all()


def test_autothrottle_matches_scrapy_semantics(ray_session):
    """The fold mirrors Scrapy extensions/throttle.py _adjust_delay: local
    step-by-step recompute agrees; non-200 responses never lower the
    delay; delays stay clamped to [MIN, MAX]."""
    import numpy as np

    from fundamental_ray.crawl import autothrottle as AT

    sf = "/root/testdata/sf0.001"
    got = AT.autothrottle_delays(sf).set_index("host")
    ids = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy()
    for host in range(AT.AT_HOSTS):
        sel = np.sort(ids[ids % AT.AT_HOSTS == host])
        delay, n_slow = AT.AT_START_DELAY_MS, 0
        prev = delay
        for d in sel:
            lat = 500 + (d * 131) % 59500
            st = 503 if d % 7 == 3 else 200
            delay = AT._adjust(delay, float(lat), int(st))
            assert AT.AT_MIN_DELAY_MS <= delay <= AT.AT_MAX_DELAY_MS
            if st != 200:
                assert delay >= prev  # errors never lower the delay
            prev = delay
            if delay >= AT.AT_SLOW_MS:
                n_slow += 1
        if host in got.index:
            assert got.loc[host, "final_delay_ms"] == round(delay, 3)
            assert got.loc[host, "n_slow_steps"] == n_slow


def _politeness_lineage(job_dir):
    recs = []
    for d in sorted(os.listdir(job_dir)):
        if not d.startswith("round="):
            continue
        p = os.path.join(job_dir, d, "lineage.jsonl")
        if not os.path.exists(p):
            continue
        with open(p) as fh:
            for line in fh:
                r = json.loads(line)
                if r["stage"] == "politeness":
                    recs.append(
                        (r["round"], r["in_rows"], r["out_rows"], r.get("deferred"))
                    )
    return sorted(recs)


def test_drain_plan_round_equivalence_and_resume(crawl_env):
    """The post-discovery drain plan (one backlog sort + per-round cursor
    advance) must be round-for-round IDENTICAL to the naive per-round
    re-sort scheduler: same cumulative counters, same round count, same
    per-round politeness lineage (in/out/deferred), same final membership
    and listings — and a job killed mid-drain must resume exactly from the
    drain-cursor checkpoint."""
    corpus, idx = crawl_env
    on_dir, off_dir = "/tmp/fr_test_job_drain_on", "/tmp/fr_test_job_drain_off"
    job_a, ca = _run(idx, on_dir, budget_per_host=5)
    job_b, cb = _run(idx, off_dir, budget_per_host=5, drain_plan=False)
    assert ca == cb
    assert job_a.round == job_b.round
    assert job_a.seen.all_urls() == job_b.seen.all_urls()
    assert _politeness_lineage(on_dir) == _politeness_lineage(off_dir)
    got = sorted(crawl_listings_dataset(on_dir).to_pandas()["url"])
    want = sorted(crawl_listings_dataset(off_dir).to_pandas()["url"])
    assert got == want
    # the drain plan actually engaged (deferred-only rounds existed)
    drain_rounds = sorted(
        d for d in os.listdir(on_dir)
        if d.startswith("round=")
        and os.path.exists(os.path.join(on_dir, d, "drain_cursor.json"))
    )
    assert drain_rounds, "budget=5 run never entered the drain phase"

    # ---- mid-drain kill + resume --------------------------------------
    r0 = int(drain_rounds[0].split("=")[1])
    jd = "/tmp/fr_test_job_drain_resume"
    shutil.rmtree(jd, ignore_errors=True)
    cfg = CrawlConfig(
        index_dir=idx, job_dir=jd, num_seen_shards=4,
        scraped_at=SCRAPED_AT, budget_per_host=5, max_rounds=r0 + 1,
    )
    job = CrawlJob(cfg, chains_from_corpus(make_chains(N_CHAINS, n_hosts=4)))
    job.run()  # stops mid-drain (max_rounds), commits everything pending
    assert os.path.exists(
        os.path.join(jd, f"round={r0 + 1:04d}", "drain_cursor.json")
    )
    from dataclasses import replace as _replace

    job2, deferred = CrawlJob.resume(_replace(cfg, max_rounds=64))
    job2.run(deferred)
    assert job2.seen.all_urls() == job_a.seen.all_urls()
    got2 = sorted(crawl_listings_dataset(jd).to_pandas()["url"])
    assert got2 == got


def test_drain_plan_equivalence_with_retries(crawl_env):
    """Transient-retry rows re-enter the drain plan as front-of-budget
    extras; per-round service must still equal the naive re-sort path."""
    corpus, idx = crawl_env
    a_dir, b_dir = "/tmp/fr_test_job_drain_rt_on", "/tmp/fr_test_job_drain_rt_off"
    job_a, ca = _run(idx, a_dir, budget_per_host=5, simulate_transient=True)
    job_b, cb = _run(
        idx, b_dir, budget_per_host=5, simulate_transient=True, drain_plan=False
    )
    assert ca == cb
    assert ca["retried"] > 0, "fault injection never fired at this corpus"
    assert job_a.round == job_b.round
    assert job_a.seen.all_urls() == job_b.seen.all_urls()
    assert _politeness_lineage(a_dir) == _politeness_lineage(b_dir)


def test_recrawl_schedule_oracle(ray_session):
    """Freshness planner vs its window-function oracle over the same
    corpus pages table (md5 class, fixed SCRAPED_AT clock)."""
    import duckdb

    from fundamental_ray.crawl.recrawl import (
        RECRAWL_TOPK_PER_HOST,
        recrawl_schedule,
        recrawl_schedule_sql,
    )

    got = recrawl_schedule("/root/testdata/sf0.001")
    corpus = materialize_corpus("sf0.001")
    want = duckdb.sql(recrawl_schedule_sql(corpus)).df()
    assert len(got) == len(want) > 0
    for c in want.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c
    # per-host quota respected and ranks contiguous from 1
    for host, g in got.groupby("host"):
        assert len(g) <= RECRAWL_TOPK_PER_HOST
        assert g["rk"].tolist() == list(range(1, len(g) + 1))


def test_host_fairness_oracle(ray_session):
    """Distributed Jain index from committed claim deltas == oracle over
    the golden seen set (set equality is the seen-set contract; this
    checks the derived fairness metric end to end)."""
    import duckdb

    from fundamental_ray.pipelines.crawl_run import (
        crawl_host_fairness,
        host_fairness_sql,
    )

    got = crawl_host_fairness("/root/testdata/sf0.001")
    corpus = materialize_corpus("sf0.001")
    want = duckdb.sql(host_fairness_sql(corpus)).df()
    assert got["n_hosts"].tolist() == want["n_hosts"].tolist()
    assert got["total_urls"].tolist() == want["total_urls"].tolist()
    assert got["jain"].tolist() == want["jain"].tolist()
    j = got["jain"].iloc[0]
    assert 1.0 / got["n_hosts"].iloc[0] <= j <= 1.0  # Jain bounds


def test_bandwidth_and_trap_oracles(ray_session):
    """Per-host bandwidth accounting + spider-trap duplication audit vs
    their DuckDB oracles over the same corpus pages table."""
    import duckdb

    from fundamental_ray.pipelines.crawl_run import (
        bandwidth_topk_sql,
        crawl_bandwidth_topk,
        crawl_trap_score,
        trap_score_sql,
    )

    corpus = materialize_corpus("sf0.001")

    got = crawl_bandwidth_topk("/root/testdata/sf0.001")
    want = duckdb.sql(bandwidth_topk_sql(corpus)).df()
    pd.testing.assert_frame_equal(
        got, want[got.columns], check_dtype=False
    )
    assert (got["bytes"].diff().dropna() <= 0).all()  # sorted by bytes desc

    got = crawl_trap_score("/root/testdata/sf0.001")
    want = duckdb.sql(trap_score_sql(corpus)).df()
    a = got.sort_values("host").reset_index(drop=True)
    b = want[got.columns].sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert (got["n_distinct"] <= got["n_pages"]).all()
    assert ((got["dup_ratio"] >= 0) & (got["dup_ratio"] < 1)).all()


def test_depth_profile_oracle(ray_session):
    import duckdb

    from fundamental_ray.pipelines.crawl_run import (
        crawl_depth_profile,
        depth_profile_sql,
    )

    corpus = materialize_corpus("sf0.001")
    got = crawl_depth_profile("/root/testdata/sf0.001")
    want = duckdb.sql(depth_profile_sql(corpus)).df()
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
    assert got["n"].sum() == len(pd.read_parquet(f"{corpus}/pages.parquet"))
    assert (got["depth"] >= 0).all() and got["depth"].max() >= 2


def test_launch_entrypoint_fresh_and_resume(tmp_path):
    """launch.py (the `ray job submit` surface) runs standalone in a
    subprocess: fresh run commits rounds, --resume restores from the last
    _COMMITTED round and reports identical cumulative counters."""
    import subprocess
    import sys

    jd = str(tmp_path / "job")
    cmd = [
        sys.executable, "/root/repo/launch.py", "--chains", "600",
        "--hosts", "4", "--zipf", "1.2", "--job-dir", jd,
    ]
    out1 = subprocess.run(
        cmd, capture_output=True, text=True, timeout=240, cwd="/root/repo"
    )
    assert out1.returncode == 0, out1.stderr[-800:]
    rec1 = json.loads(out1.stdout.strip().splitlines()[-1])
    assert rec1["counters"]["fetched"] > 0 and rec1["rounds"] > 0

    out2 = subprocess.run(
        cmd + ["--resume"], capture_output=True, text=True, timeout=240,
        cwd="/root/repo",
    )
    assert out2.returncode == 0, out2.stderr[-800:]
    rec2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert rec2["resumed"] and rec2["rounds"] == rec1["rounds"]
    assert rec2["counters"]["fetched"] == rec1["counters"]["fetched"]
    assert rec2["counters"]["listings"] == rec1["counters"]["listings"]


def test_robots_wildcard_rules():
    # RFC 9309 '*' wildcard and '$' end anchor, precedence by rule length
    # with Allow winning ties — scalar and vectorized paths must agree
    import numpy as np

    from fundamental_ray.crawl.robots import RobotsTable, parse_robots

    r = parse_robots(
        """
User-agent: *
Disallow: /private/*
Allow: /private/ok$
Disallow: /cgi*bin/
Disallow: /exact$
Allow: /
"""
    )
    cases = {
        "/private/x": False,   # wildcard disallow (len 10) beats Allow /
        "/private/ok": True,   # $-anchored allow (len 12) wins
        "/private/ok2": False, # anchor must not match a longer path
        "/cgi-bin/x": False,   # mid-rule wildcard
        "/exact": False,
        "/exact2": True,       # $ means exact only
        "/fine": True,
    }
    for p, want in cases.items():
        assert r.allowed(p) == want, p
    t = RobotsTable({"h.example": r})
    urls = [f"https://h.example{p}" for p in cases]
    mask = t.allowed_mask(["h.example"] * len(cases), urls)
    assert list(mask) == list(cases.values())
    # unruled hosts stay zero-cost allowed
    assert t.allowed_mask(["other.example"], ["https://other.example/private/x"])[0]


def test_seen_exact_tier_disk_spill_parity(crawl_env):
    """Forcing the exact-tier spill threshold tiny (8 keys/shard) pages
    every shard's membership to its on-disk SQLite hash file mid-crawl;
    the final membership, visits and listings must be IDENTICAL to the
    in-memory run, and checkpoint-resume must still work."""
    corpus, idx = crawl_env
    job, counters = _run(
        idx, "/tmp/fr_test_job_spill", budget_per_host=1000,
        seen_spill_threshold=8,
    )
    con, g_seen, g_visits = _golden(corpus)
    assert job.seen.all_urls() == g_seen
    assert _got_visits("/tmp/fr_test_job_spill") == g_visits
    ref = _run(idx, "/tmp/fr_test_job_spill_ref", budget_per_host=1000)[1]
    assert counters == ref

    # the disk tier actually engaged: shards hold > threshold keys
    import ray as _ray

    pool = job.seen.pools["active"]
    sizes = _ray.get([s.size.remote() for s in pool.shards])
    assert max(sizes) > 8

    # resume against the spilled job dir (fresh shards, recovery replay)
    from dataclasses import replace as _replace

    cfg = CrawlConfig(
        index_dir=idx, job_dir="/tmp/fr_test_job_spill", num_seen_shards=4,
        scraped_at=SCRAPED_AT, budget_per_host=1000, seen_spill_threshold=8,
    )
    job2, deferred = CrawlJob.resume(cfg)
    job2.run(deferred)
    assert job2.seen.all_urls() == g_seen


def test_backlog_bucket_count_invariance(crawl_env):
    """Per-host service is independent across hosts, so the hash(host)
    bucket count must not change ANY outcome: counters, membership and
    listings identical at B=2 and B=16 (default 8 is pinned by every
    other test)."""
    corpus, idx = crawl_env
    con, g_seen, _ = _golden(corpus)
    outs = {}
    for B in (2, 16):
        job, counters = _run(
            idx, f"/tmp/fr_test_job_b{B}buckets", budget_per_host=5,
            backlog_buckets=B,
        )
        assert job.seen.all_urls() == g_seen
        outs[B] = counters
    assert outs[2] == outs[16]
    got2 = sorted(
        crawl_listings_dataset("/tmp/fr_test_job_b2buckets").to_pandas()["url"]
    )
    got16 = sorted(
        crawl_listings_dataset("/tmp/fr_test_job_b16buckets").to_pandas()["url"]
    )
    assert got2 == got16
