"""Cluster job entrypoint: run the frontier crawl as a Ray Job.

This is the `ray job submit` surface from the north rule — the same
engine `bench.py` times, packaged so a fixed-size multi-node cluster runs
it against a pages corpus and a resumable job directory:

    # N-node and 4N-node clusters, identical invocation:
    ray job submit --address http://<head>:8265 \
        --working-dir . -- python launch.py \
        --corpus /shared/pages-corpus --job-dir /shared/jobs/crawl-1 \
        --budget 100000

    # resume after a driver crash (skips every _COMMITTED round):
    ray job submit ... -- python launch.py \
        --corpus /shared/pages-corpus --job-dir /shared/jobs/crawl-1 --resume

Inside the job, Ray is already running on the cluster, so we attach to it
(``address="auto"``); run standalone (this sandbox) and it starts a local
session instead. Prints ONE JSON line: counters, rounds, wall seconds,
urls/sec — the same metric surface `bench.py` records, so N vs 4N
throughput comparison is one field. In this sandbox the two-cluster-size
criterion is evidenced by `bench.py --scaling` (two fresh processes at
num_cpus=8 / 32 over the identical input — see BASELINE.md); on a real
cluster the SAME launch runs at both cluster sizes unchanged.

As a CLI entry point this file OWNS a Ray session (guarded init); the
library and `__ray_entry__` never call ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--corpus",
        help="dir containing pages.parquet (Common-Crawl-style page table); "
        "omit to use the deterministic synthetic bench corpus",
    )
    ap.add_argument("--chains", type=int, default=9600,
                    help="synthetic corpus size when --corpus is omitted")
    ap.add_argument("--hosts", type=int, default=64)
    ap.add_argument("--zipf", type=float, default=1.2)
    ap.add_argument("--job-dir", required=True,
                    help="checkpoint/output dir (rounds commit here)")
    ap.add_argument("--index-dir", default=None,
                    help="fetch-index dir (default: <job-dir>.index)")
    ap.add_argument("--budget", type=int, default=100_000,
                    help="politeness budget per host per round")
    ap.add_argument("--seen-shards", type=int, default=0,
                    help="cuckoo seen-set shards (default: cpus/2)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the job dir's last _COMMITTED round")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the cluster exists: attach. Standalone
        # (RAY_ADDRESS=local or unset): a local session.
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "auto"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fundamental_ray.crawl.fetchstore import build_fetch_index
    from fundamental_ray.crawl.frontier import (
        CrawlConfig, CrawlJob, chains_from_corpus,
    )
    from fundamental_ray.synth.corpus import make_chains
    from fundamental_ray.synth.materialize import (
        SCRAPED_AT, materialize_bench_corpus,
    )

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    corpus = args.corpus or materialize_bench_corpus(
        args.chains, args.hosts, args.zipf
    )
    index_dir = args.index_dir or (args.job_dir.rstrip("/") + ".index")
    idx = build_fetch_index(
        f"{corpus}/pages.parquet", index_dir, num_buckets=max(16, ncpu)
    )
    cfg = CrawlConfig(
        index_dir=idx,
        job_dir=args.job_dir,
        budget_per_host=args.budget,
        num_seen_shards=args.seen_shards or max(4, ncpu // 2),
        scraped_at=SCRAPED_AT,
    )
    t0 = time.time()
    if args.resume:
        job, deferred = CrawlJob.resume(cfg)
        counters = job.run(deferred=deferred)
    else:
        chains = chains_from_corpus(
            make_chains(args.chains, n_hosts=args.hosts, zipf_s=args.zipf)
        )
        job = CrawlJob(cfg, chains)
        counters = job.run()
    wall = time.time() - t0
    urls_checked = job.seen.total() + counters["deduped"]
    print(
        json.dumps(
            {
                "job_dir": args.job_dir,
                "resumed": bool(args.resume),
                "rounds": job.round,
                "counters": counters,
                "wall_sec": round(wall, 2),
                "urls_per_sec": round(urls_checked / wall, 1) if wall else None,
                "num_cpus": ncpu,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
