#!/usr/bin/env python
"""Benchmark harness (driver contract).

``python bench.py``            → ONE JSON line with headline seconds + per-query
                                 seconds over $GRAFT_SF_DIR (default sf0.1) at
                                 num_cpus=$RAY_GRAFT_CPUS (default 32).
``python bench.py --scaling``  → runs the same job in two fresh subprocesses at
                                 num_cpus=$FR_SCALE_LO and $FR_SCALE_HI
                                 (default 2 and 8 — the N→4N pair free of the
                                 single-box frequency-scaling confound; see
                                 BASELINE.md, which also records the 8→32
                                 measurement + hardware control) and reports
                                 both throughputs, the scaling efficiency and
                                 the hardware/orchestration decomposition.
                                 FR_SCALE_TRIALS=k repeats the pair k times
                                 with alternating leg order and reports the
                                 median of per-trial ratios (drift-cancelling
                                 estimator; see BASELINE.md).

Headline metric: frontier throughput — URLs claimed (scheduled+deduped) per
second through the full crawl pipeline (candidate extraction → sharded
seen-set claim → politeness → robots → fetch-join → extraction) over the
heavy-tailed bench corpus (FIXTURES.md §6).
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_CHAINS = int(os.environ.get("FR_BENCH_CHAINS", "2400"))
BENCH_HOSTS = int(os.environ.get("FR_BENCH_HOSTS", "64"))
BENCH_ZIPF = 1.2


def run_bench() -> dict:
    import logging

    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    init_kw = {}
    # packed --scaling legs run several Ray sessions side by side: each gets
    # an explicit object-store slice so 4 concurrent sessions don't each
    # reserve the default ~40% of system memory in /dev/shm
    if os.environ.get("FR_OBJECT_STORE_GB"):
        init_kw["object_store_memory"] = int(
            float(os.environ["FR_OBJECT_STORE_GB"]) * 2**30
        )
    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        logging_level="ERROR", log_to_driver=False, **init_kw,
    )
    # log_to_driver=False: raylet/worker chatter (e.g. the zero-cpu-actor
    # "N PYTHON worker processes" warning) otherwise lands on STDOUT and
    # can race past the single JSON line this script contracts to print
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from fundamental_ray.crawl.fetchstore import build_fetch_index
    from fundamental_ray.crawl.frontier import (
        CrawlConfig, CrawlJob, chains_from_corpus,
    )
    from fundamental_ray.ops import ann as N
    from fundamental_ray.ops import cluster as K
    from fundamental_ray.ops import corpus_stats as CS
    from fundamental_ray.ops import dedup as D
    from fundamental_ray.ops import graph as GR
    from fundamental_ray.ops import joins as JN
    from fundamental_ray.ops import sketch as SK
    from fundamental_ray.ops import text as T
    from fundamental_ray.ops import webtext as WT
    from fundamental_ray.crawl import anchors as ANC
    from fundamental_ray.ops import bloom as BL
    from fundamental_ray.ops import pq as PQ
    from fundamental_ray.pipelines import analytics as A
    from fundamental_ray.pipelines import clean as CL
    from fundamental_ray.pipelines.extract import extract_listings_dataset
    from fundamental_ray.synth.corpus import make_chains
    from fundamental_ray.synth.materialize import (
        SCRAPED_AT, materialize_bench_corpus,
    )

    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    # -- corpus + index (cached on disk; untimed, warms the page cache) ----
    corpus = materialize_bench_corpus(BENCH_CHAINS, BENCH_HOSTS, BENCH_ZIPF)
    idx = build_fetch_index(
        f"{corpus}/pages.parquet",
        f"/tmp/fr_bench_index/{os.path.basename(corpus)}",
        num_buckets=32,
    )

    # warm the worker pool: every worker imports the library once so the
    # timed sections measure compute, not process cold-start
    @ray.remote(num_cpus=1)
    def _warm(_):
        import fundamental_ray.crawl.frontier  # noqa: F401
        return 0

    ray.get([_warm.remote(i) for i in range(num_cpus)])

    # -- headline: full frontier crawl ------------------------------------
    # FR_BENCH_REPEAT > 1 runs the identical crawl k times in this process
    # and reports the fastest — the scaling harness uses 2 per leg (both
    # legs treated identically) because this virtualized host shows ±30-40%
    # one-shot noise that would otherwise dominate the efficiency ratio
    import shutil

    repeat = int(os.environ.get("FR_BENCH_REPEAT", "2"))
    chains_spec = make_chains(BENCH_CHAINS, n_hosts=BENCH_HOSTS, zipf_s=BENCH_ZIPF)
    best = None
    runs = []
    for rep in range(repeat):
        job_dir = (
            f"/tmp/fr_bench_job_{num_cpus}"
            + os.environ.get("FR_BENCH_JOB_TAG", "")
        )
        shutil.rmtree(job_dir, ignore_errors=True)
        # FR_BENCH_BUDGET: the data-scale series holds per-host budget high
        # enough that the free-crawl regime (zero deferrals) is measured at
        # every corpus size — at 153,600 chains the heavy host exceeds the
        # default 100k and the run silently crosses into the
        # politeness-bound regime, which is a different benchmark
        cfg = CrawlConfig(
            index_dir=idx, job_dir=job_dir,
            budget_per_host=int(os.environ.get("FR_BENCH_BUDGET", "100000")),
            num_seen_shards=max(4, num_cpus // 2), scraped_at=SCRAPED_AT,
        )
        t0 = time.time()
        job = CrawlJob(cfg, chains_from_corpus(chains_spec))
        counters = job.run()
        crawl_sec = time.time() - t0
        # URLs scheduled+deduped = every candidate checked against the seen
        # set: novel claims (= final membership) + duplicate rejections
        urls_checked = job.seen.total() + counters["deduped"]
        runs.append(round(crawl_sec, 2))
        if best is None or crawl_sec < best[0]:
            best = (crawl_sec, counters, job.round, urls_checked)
    crawl_sec, counters, rounds, urls_checked = best
    queries["crawl_frontier"] = round(crawl_sec, 2)
    extra["frontier_urls_per_sec"] = round(urls_checked / crawl_sec, 1)
    extra["crawl_counters"] = counters
    extra["crawl_rounds"] = rounds
    if repeat > 1:
        extra["crawl_run_secs"] = runs

    # -- politeness-constrained crawl: deferral machinery under Zipf skew --
    # (skipped in --scaling legs: not the headline metric, and slow at low
    # cpu counts)
    if os.environ.get("FR_BENCH_POLITE", "1") != "0":
        _bench_polite(num_cpus, idx, queries, extra)

    # -- extraction-only throughput over all detail pages ------------------
    t0 = time.time()
    n_listings = extract_listings_dataset(
        f"{corpus}/pages.parquet", scraped_at=SCRAPED_AT,
        batch_size=128,
    ).count()
    queries["extract_listings"] = round(time.time() - t0, 2)
    extra["extract_pages_per_sec"] = round(n_listings / queries["extract_listings"], 1)

    # -- secondary pipelines over the testdata sf dir ----------------------
    # (FR_BENCH_SECONDARY=0 in --scaling legs: they are timed over the FIXED
    # sf0.1 testdata, so they contribute nothing to the frontier-throughput
    # ratio the scaling harness reports — only leg wall-clock)
    secondary = [] if os.environ.get("FR_BENCH_SECONDARY", "1") == "0" else [
        ("agg_weighted_status_stats", lambda: A.weighted_status_stats(sf_dir)),
        ("events_sessionize", lambda: A.events_sessionize(sf_dir)),
        ("dedup_minhash_lsh", lambda: D.minhash_lsh_pairs(sf_dir, 0.5)),
        ("text_quality_scores", lambda: T.quality_scores(sf_dir)),
        ("text_decontaminate", lambda: T.decontaminate(sf_dir)),
        ("text_vocab_topk", lambda: CS.vocab_topk(sf_dir)),
        ("cluster_kmeans", lambda: K.kmeans_clusters(sf_dir)),
        ("pipeline_clean_corpus", lambda: CL.clean_corpus(sf_dir)),
        ("dedup_chunk_keepfirst", lambda: D.chunk_dedup(sf_dir)),
        ("pipeline_select_corpus", lambda: CS.select_corpus(sf_dir)),
        ("ann_brute_force_topk", lambda: N.brute_force_topk(sf_dir)),
        ("sketch_quantiles_price", lambda: SK.sketch_quantiles_price(sf_dir)),
        ("join_asof_prior_view", lambda: JN.asof_prior_view(sf_dir)),
        ("graph_pagerank", lambda: GR.pagerank(sf_dir)),
        ("graph_hits", lambda: GR.hits(sf_dir)),
        ("text_pmi_bigrams", lambda: WT.pmi_bigrams(sf_dir)),
        ("text_bigram_perplexity", lambda: WT.bigram_perplexity(sf_dir)),
        ("events_watermark_late", lambda: WT.events_watermark_late(sf_dir)),
        ("crawl_anchor_texts", lambda: ANC.anchor_texts(sf_dir)),
        ("dedup_bloom_delta", lambda: BL.bloom_delta_dedup(sf_dir)),
        ("ann_pq_topk", lambda: PQ.pq_topk(sf_dir)),
    ]
    for name, fn in secondary:
        t0 = time.time()
        fn()
        queries[name] = round(time.time() - t0, 2)

    total = round(sum(queries.values()), 2)
    result = {
        "metric": "frontier throughput (URLs scheduled+deduped/sec) + headline pipeline seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "num_cpus": num_cpus,
        **extra,
    }
    ray.shutdown()
    if os.environ.get("FR_BENCH_CONTROL", "0") == "1":
        # hardware control measured IN this leg's process, seconds after
        # its crawl — the host's noisy-neighbor state drifts minute to
        # minute, so a control taken later (after both legs) decomposes
        # the wrong host state (observed: control anti-correlated with the
        # crawl it was meant to normalize)
        result["parse_control_pages_per_sec"] = _parse_control(num_cpus)
    return result


def _bench_polite(num_cpus, idx, queries, extra):
    import shutil
    import time as _t

    from fundamental_ray.crawl.frontier import CrawlConfig, CrawlJob, chains_from_corpus
    from fundamental_ray.synth.corpus import make_chains
    from fundamental_ray.synth.materialize import SCRAPED_AT

    job_dir_p = f"/tmp/fr_bench_job_polite_{num_cpus}"
    shutil.rmtree(job_dir_p, ignore_errors=True)
    cfg_p = CrawlConfig(
        index_dir=idx, job_dir=job_dir_p, budget_per_host=8_000,
        num_seen_shards=max(4, num_cpus // 2), scraped_at=SCRAPED_AT,
        max_rounds=128,
        # FR_DRAIN=0 forces the naive per-round backlog re-sort (A/B lever
        # for the post-discovery drain plan; semantics identical either way)
        drain_plan=os.environ.get("FR_DRAIN", "1") != "0",
    )
    t0 = _t.time()
    job_p = CrawlJob(
        cfg_p,
        chains_from_corpus(
            make_chains(BENCH_CHAINS, n_hosts=BENCH_HOSTS, zipf_s=BENCH_ZIPF)
        ),
    )
    counters_p = job_p.run()
    queries["crawl_frontier_polite"] = round(_t.time() - t0, 2)
    extra["polite_deferred"] = counters_p["deferred"]
    extra["polite_rounds"] = job_p.round
    # scale gauge: max rows the politeness path materialized ON THE DRIVER
    # in any round — bounded by hosts × budget (the backlog itself lives in
    # per-bucket object-store blocks / drain actors, never on the driver)
    extra["polite_driver_max_pending_rows"] = job_p.driver_max_pending_rows


def _parse_control(nproc: int) -> float:
    """Hardware control: the same per-page parse kernel under plain
    multiprocessing (no Ray, no object store) at ``nproc`` processes. On
    one box, per-core throughput drops as occupancy rises (frequency/
    memory effects), which caps ANY orchestration's wall-clock scaling — a
    real N→4N *node* cluster does not share this confound. Each bench leg
    measures its OWN control so the decomposition reflects the host state
    that leg actually ran under."""
    import glob
    import multiprocessing as mp

    import pyarrow.parquet as pq  # noqa: F401

    files = sorted(
        glob.glob(
            f"/tmp/fr_corpus/*bench-c{BENCH_CHAINS}-h{BENCH_HOSTS}-z{BENCH_ZIPF}/pages.parquet/*.parquet"
        )
    )
    per = 600
    jobs = [(files[i % len(files)], per) for i in range(nproc)]
    with mp.Pool(nproc) as p:
        p.map(_parse_slice, [(files[0], 50)] * nproc)  # warm imports
        t0 = time.time()
        p.map(_parse_slice, jobs)
        dt = time.time() - t0
    return round(per * nproc / dt, 1)


def _parse_slice(args):
    path, n = args
    import pyarrow.parquet as pq

    from fundamental_ray.extraction.listing import extract_listing_row, place_from_url

    t = pq.read_table(path, columns=["url", "html"]).slice(0, n)
    k = 0
    for url, html in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
        if "/detail/" in url:
            k += extract_listing_row(html.decode(), url, place_from_url(url)) is not None
    return k


def run_scaling() -> dict:
    import subprocess

    def _leg_cmd(ncpu: int, cpu_range: str | None, extra_env: dict) -> tuple:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), FR_BENCH_POLITE="0",
            FR_BENCH_REPEAT=os.environ.get("FR_BENCH_REPEAT", "2"),
            FR_BENCH_CONTROL="1", FR_BENCH_SECONDARY="0", **extra_env,
        )
        cmd = [sys.executable, os.path.abspath(__file__)]
        # confine the whole leg (raylet, workers, num_cpus=0 actors, the
        # in-process control) to exactly ncpu PHYSICAL cores: without the
        # cpuset, a small-N leg's zero-cpu actors and system threads spill
        # onto the box's idle cores — free parallelism an N-core NODE would
        # not have — inflating the lo leg and understating efficiency
        import shutil as _sh

        if _sh.which("taskset"):
            cmd = ["taskset", "-c", cpu_range or f"0-{ncpu - 1}"] + cmd
        return cmd, env

    def one(ncpu: int, cpu_range: str | None = None, **extra_env) -> dict:
        cmd, env = _leg_cmd(ncpu, cpu_range, extra_env)
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def packed_lo(lo: int, hi: int) -> list[dict]:
        """The bandwidth-equalized LO leg: hi//lo CONCURRENT lo-cpu jobs on
        disjoint cpusets filling the whole box. Rationale: a 4N-node
        cluster has 4x the aggregate memory bandwidth / L3 of an N-node
        cluster, but `taskset` pins only CPUs — a solo lo-cpu leg borrows
        the idle cores' bandwidth and turbo headroom, an advantage no real
        N-node cluster has over its 4N sibling (per node they're
        identical). Packing the box with hi/lo simultaneous lo-cpu jobs
        gives every job the same per-core memory system the hi-cpu leg
        sees; per-job throughput is then the honest N-node-cluster rate.
        Each job gets its own job dir and a proportional object-store
        slice; the shared read-only corpus/index caches serve both legs
        identically (warmed by the HI leg, which runs first)."""
        k = hi // lo
        procs = []
        for i in range(k):
            cmd, env = _leg_cmd(
                lo, f"{i * lo}-{(i + 1) * lo - 1}",
                dict(FR_BENCH_JOB_TAG=f"_p{i}", FR_OBJECT_STORE_GB="9"),
            )
            procs.append(subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True,
            ))
        outs = []
        for p in procs:
            stdout, stderr = p.communicate()
            if p.returncode != 0:
                raise RuntimeError(f"packed leg failed: {stderr[-500:]}")
            outs.append(json.loads(stdout.strip().splitlines()[-1]))
        return outs

    lo, hi = int(os.environ.get("FR_SCALE_LO", "2")), int(os.environ.get("FR_SCALE_HI", "8"))
    if os.environ.get("FR_SCALE_PACKED") == "1":
        if hi % lo:
            raise SystemExit("FR_SCALE_PACKED needs hi divisible by lo")
        trials = max(1, int(os.environ.get("FR_SCALE_TRIALS", "1")))
        # FR_SCALE_SANDWICH=1: run the HI leg BOTH before and after the
        # packed-LO block and score efficiency against the MEAN of the two.
        # Rationale: legs run ~8 minutes apart, and this host's minute-scale
        # weather means each trial's ratio inherits one window transition
        # at full force when HI is sampled once; bracketing the LO block
        # with two HI samples averages the windows on either side, halving
        # the transition variance (both single-leg ratios are also
        # reported, so a glitched bracket is visible).
        sandwich = os.environ.get("FR_SCALE_SANDWICH") == "1"
        per_trial = []
        for _ in range(trials):
            r_hi = one(hi)  # full box first: warms corpus/index caches
            jobs = packed_lo(lo, hi)
            tputs = [j["frontier_urls_per_sec"] for j in jobs]
            tput_hi = r_hi["frontier_urls_per_sec"]
            row = {
                "efficiency": round(tput_hi / sum(tputs), 3),
                "urls_per_sec_lo_per_job": tputs,
                "urls_per_sec_lo_aggregate": round(sum(tputs), 1),
                "urls_per_sec_hi": tput_hi,
                "crawl_sec_lo_per_job": [
                    j["queries"]["crawl_frontier"] for j in jobs
                ],
                "crawl_sec_hi": r_hi["queries"]["crawl_frontier"],
                "parse_control_pages_per_sec": {
                    "lo_per_job": [
                        j["parse_control_pages_per_sec"] for j in jobs
                    ],
                    "hi": r_hi["parse_control_pages_per_sec"],
                },
            }
            if sandwich:
                r_hi2 = one(hi)
                t2 = r_hi2["frontier_urls_per_sec"]
                row["urls_per_sec_hi_post"] = t2
                row["crawl_sec_hi_post"] = r_hi2["queries"]["crawl_frontier"]
                row["efficiency_pre"] = row["efficiency"]
                row["efficiency_post"] = round(t2 / sum(tputs), 3)
                row["efficiency"] = round(
                    (tput_hi + t2) / 2 / sum(tputs), 3
                )
            # PRE-REGISTERED glitch rule (fixed in code BEFORE the round-5
            # session ran): a trial QUALIFIES iff its in-leg parse-control
            # ratio hi_ctrl / Σ lo_ctrl — identical non-engine work run
            # inside each leg — is within ±10% of 1.0, i.e. the two legs
            # demonstrably saw the same host window. Trials outside the
            # band are reported but excluded from the qualifying median
            # (the r4 series showed half-speed-HI windows produce 0.40-
            # 0.56 readings that are host weather, not engine scaling).
            ctrl = row["parse_control_pages_per_sec"]
            ctrl_ratio = ctrl["hi"] / max(1e-9, sum(ctrl["lo_per_job"]))
            row["ctrl_ratio"] = round(ctrl_ratio, 3)
            row["qualifies"] = bool(abs(ctrl_ratio - 1.0) <= 0.10)
            per_trial.append(row)
        effs = sorted(t["efficiency"] for t in per_trial)
        med = effs[len(effs) // 2] if len(effs) % 2 else (
            effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2
        q = sorted(t["efficiency"] for t in per_trial if t["qualifies"])
        qmed = None
        if q:
            qmed = q[len(q) // 2] if len(q) % 2 else (
                q[len(q) // 2 - 1] + q[len(q) // 2]) / 2
        return {
            "metric": (
                f"scaling efficiency (frontier urls/sec, packed: "
                f"{hi // lo} concurrent {lo}-cpu jobs vs one {hi}-cpu job)"
            ),
            "value": round(med, 3),
            "unit": "efficiency",
            "cpus_lo": lo, "cpus_hi": hi, "packed_jobs": hi // lo,
            "trials": trials,
            "qualifying_median": round(qmed, 3) if qmed is not None else None,
            "n_qualifying": len(q),
            "glitch_rule": "qualify iff |hi_ctrl/sum(lo_ctrl) - 1| <= 0.10",
            "per_trial": per_trial,
            "sf": 0.1,
        }
    # FR_SCALE_TRIALS > 1 runs the pair k times with ALTERNATING leg order
    # (LO,HI then HI,LO, ...) and reports the median of per-trial ratios.
    # Rationale: this host's minute-scale frequency/bandwidth weather is the
    # dominant noise term (BASELINE.md runs 8 vs 9: same binary, 0.826 vs
    # 0.588, 40 min apart). Alternating order cancels monotone drift across
    # the session (a drift that inflates whichever leg runs later inflates
    # LO in half the trials and HI in the other half); the median of paired
    # ratios is robust to a single glitched window. Single-trial (default)
    # keeps the historical protocol.
    trials = max(1, int(os.environ.get("FR_SCALE_TRIALS", "1")))
    per_trial = []
    for i in range(trials):
        order = (lo, hi) if i % 2 == 0 else (hi, lo)
        res = {}
        for ncpu in order:
            res[ncpu] = one(ncpu)
        r_lo, r_hi = res[lo], res[hi]
        tput_lo = r_lo["frontier_urls_per_sec"]
        tput_hi = r_hi["frontier_urls_per_sec"]
        eff = (tput_hi / tput_lo) / (hi / lo)
        control = {lo: r_lo["parse_control_pages_per_sec"],
                   hi: r_hi["parse_control_pages_per_sec"]}
        intrinsic_eff = (control[hi] / control[lo]) / (hi / lo)
        per_trial.append({
            "order": f"{order[0]}->{order[1]}",
            "efficiency": round(eff, 3),
            "urls_per_sec_lo": tput_lo, "urls_per_sec_hi": tput_hi,
            "crawl_sec_lo": r_lo["queries"]["crawl_frontier"],
            "crawl_sec_hi": r_hi["queries"]["crawl_frontier"],
            "extract_pages_per_sec_lo": r_lo["extract_pages_per_sec"],
            "extract_pages_per_sec_hi": r_hi["extract_pages_per_sec"],
            "parse_control_pages_per_sec": control,
            "hardware_intrinsic_efficiency": round(intrinsic_eff, 3),
            "orchestration_efficiency": round(eff / intrinsic_eff, 3),
        })
    effs = sorted(t["efficiency"] for t in per_trial)
    med = effs[len(effs) // 2] if len(effs) % 2 else (
        effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2
    head = per_trial[0]
    return {
        "metric": f"scaling efficiency (frontier urls/sec, {lo} → {hi} cpus)",
        "value": round(med, 3),
        "unit": "efficiency",
        "cpus_lo": lo, "cpus_hi": hi,
        "trials": trials,
        "per_trial": per_trial if trials > 1 else None,
        "urls_per_sec_lo": head["urls_per_sec_lo"],
        "urls_per_sec_hi": head["urls_per_sec_hi"],
        "crawl_sec_lo": head["crawl_sec_lo"],
        "crawl_sec_hi": head["crawl_sec_hi"],
        "extract_pages_per_sec_lo": head["extract_pages_per_sec_lo"],
        "extract_pages_per_sec_hi": head["extract_pages_per_sec_hi"],
        "parse_control_pages_per_sec": head["parse_control_pages_per_sec"],
        "hardware_intrinsic_efficiency": head["hardware_intrinsic_efficiency"],
        "orchestration_efficiency": head["orchestration_efficiency"],
        "sf": 0.1,
    }


if __name__ == "__main__":
    # The driver contract is ONE JSON line on stdout. Ray's raylet pushes
    # warnings (e.g. the zero-cpu-actor "N PYTHON worker processes"
    # notice) to the inherited fd 1 regardless of log_to_driver, racing
    # the result line — so park the REAL stdout on a saved fd, point fd 1
    # at stderr for the whole run (raylet children inherit that), and
    # write the JSON to the saved fd at the end.
    _real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = os.fdopen(os.dup(1), "w")
    try:
        if "--scaling" in sys.argv:
            _line = json.dumps(run_scaling())
        else:
            _line = json.dumps(run_bench())
    finally:
        sys.stdout.flush()
    os.write(_real_stdout, (_line + "\n").encode())
    os.close(_real_stdout)
