"""Driver-facing crawl pipeline: run the frontier once per scale tag and
expose its deterministic artifacts (page visits, seen set, counters,
listings) as queries. Results are cached per corpus under /tmp (idempotent
_COMMITTED rounds), so the driver's several crawl queries share one run."""

from __future__ import annotations

import os

import pandas as pd

from ..crawl.fetchstore import build_fetch_index
from ..crawl.frontier import (
    CrawlConfig,
    CrawlJob,
    chains_from_corpus,
    crawl_listings_dataset,
)
from ..synth.corpus import make_chains
from ..synth.materialize import (
    SCALE_CHAINS,
    SCRAPED_AT,
    materialize_corpus,
    scale_tag_of,
)

_MEMO: dict[str, tuple[CrawlJob, str]] = {}


def run_crawl(tag: str) -> tuple[CrawlJob, str]:
    if tag in _MEMO:
        return _MEMO[tag]
    n_chains = SCALE_CHAINS[tag]
    corpus = materialize_corpus(tag)
    idx = build_fetch_index(
        f"{corpus}/pages.parquet", f"/tmp/fr_index/{os.path.basename(corpus)}", 16
    )
    job_dir = f"/tmp/fr_jobs/{os.path.basename(corpus)}"
    cfg = CrawlConfig(
        index_dir=idx, job_dir=job_dir, budget_per_host=1_000,
        num_seen_shards=8, scraped_at=SCRAPED_AT,
    )
    job = CrawlJob(cfg, chains_from_corpus(make_chains(n_chains, n_hosts=4)))
    job.run()
    _MEMO[tag] = (job, job_dir)
    return job, job_dir


def crawl_page_visits(sf_dir: str) -> pd.DataFrame:
    """Golden-comparable page-visit log: the §3.1 ordering contract."""
    import json

    _, job_dir = run_crawl(scale_tag_of(sf_dir))
    rows = []
    for d in sorted(os.listdir(job_dir)):
        if not d.startswith("round="):
            continue
        with open(os.path.join(job_dir, d, "counters.json")) as fh:
            j = json.load(fh)
        for cid, pv in j["page_visits"].items():
            if pv["visited"]:
                rows.append(
                    {
                        "chain_id": int(cid), "page_seq": j["round"],
                        "found": pv["found"], "new": pv["new"],
                        "skipped": pv["found"] - pv["new"],
                    }
                )
    return pd.DataFrame(sorted(rows, key=lambda r: (r["chain_id"], r["page_seq"])))


def crawl_seen_set(sf_dir: str) -> pd.DataFrame:
    job, _ = run_crawl(scale_tag_of(sf_dir))
    return pd.DataFrame({"url": sorted(job.seen.all_urls())})


def crawl_counters(sf_dir: str) -> pd.DataFrame:
    job, _ = run_crawl(scale_tag_of(sf_dir))
    return pd.DataFrame([{"rounds": job.round, **job.counters}])


def crawl_listings(sf_dir: str):
    _, job_dir = run_crawl(scale_tag_of(sf_dir))
    return crawl_listings_dataset(job_dir)
