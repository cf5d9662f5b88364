"""Materialize the synthetic pages table + goldens to Parquet, cached.

Scale tags map testdata sf dirs to corpus sizes so ``queries()`` callables
can derive a deterministic crawl input from their ``sf_dir`` argument.
Everything is a pure function of (SEED, tag); the cache directory name
carries a generation fingerprint so stale caches self-invalidate.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .corpus import chain_rows, make_chains, simulate_reference_crawl, unique_listings

GEN_VERSION = "v1"  # bump when generator output changes

SCALE_CHAINS = {"sf0.001": 6, "sf0.01": 24, "sf0.1": 96}

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

SCRAPED_AT = "2024-07-01T00:00:00"  # round timestamp: from config, never wall-clock


def scale_tag_of(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base in SCALE_CHAINS else "sf0.01"


def corpus_dir(tag: str, n_chains: int | None = None, n_hosts: int = 4, zipf_s: float = 0.0) -> str:
    n = n_chains or SCALE_CHAINS[tag]
    return f"/tmp/fr_corpus/{GEN_VERSION}-{tag}-c{n}-h{n_hosts}-z{zipf_s}"


def materialize_corpus(
    tag: str = "sf0.01",
    n_chains: int | None = None,
    n_hosts: int = 4,
    zipf_s: float = 0.0,
) -> str:
    """Write pages.parquet + golden tables; returns the directory. Idempotent
    (skips when the _DONE marker exists)."""
    n = n_chains or SCALE_CHAINS[tag]
    out = corpus_dir(tag, n, n_hosts, zipf_s)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    chains = make_chains(n, n_hosts=n_hosts, zipf_s=zipf_s)

    writer = pq.ParquetWriter(os.path.join(out, "pages.parquet.tmp"), PAGES_SCHEMA)
    golden_rows: list[dict] = []
    visit_rows: list[dict] = []
    seen_rows: list[dict] = []
    buf: list[dict] = []

    def flush():
        nonlocal buf
        if buf:
            writer.write_table(pa.Table.from_pylist(buf, schema=PAGES_SCHEMA))
            buf = []

    for chain in chains:
        buf.extend(chain_rows(chain))
        if len(buf) >= 4096:
            flush()
        visits, processed, blocked = simulate_reference_crawl(chain)
        for v in visits:
            visit_rows.append(
                {
                    "chain_id": v.chain_id, "page_seq": v.page_seq, "page_url": v.page_url,
                    "found": v.found, "new": v.new, "skipped": v.skipped,
                }
            )
        for u in sorted(processed):
            seen_rows.append({"chain_id": chain.chain_id, "url": u, "blocked": u in blocked})
        for l in unique_listings(chain):
            g = l.golden(SCRAPED_AT)
            if g is not None and l.url in processed:
                golden_rows.append({**g, "chain_id": chain.chain_id, "family": l.family})
    flush()
    writer.close()
    os.replace(os.path.join(out, "pages.parquet.tmp"), os.path.join(out, "pages.parquet"))

    pq.write_table(pa.Table.from_pylist(visit_rows), os.path.join(out, "golden_frontier_order.parquet"))
    pq.write_table(pa.Table.from_pylist(seen_rows), os.path.join(out, "golden_seen_set.parquet"))

    from ..extraction.listing import LISTING_SCHEMA

    gschema = LISTING_SCHEMA.append(pa.field("chain_id", pa.int64())).append(
        pa.field("family", pa.string())
    )
    pq.write_table(
        pa.Table.from_pylist(golden_rows, schema=gschema),
        os.path.join(out, "golden_listings.parquet"),
    )
    with open(done, "w") as fh:
        fh.write("ok")
    return out


def materialize_bench_corpus(
    n_chains: int = 1200, n_hosts: int = 64, zipf_s: float = 1.2
) -> str:
    """Bench-scale pages corpus (FIXTURES.md §6): heavy-tailed Zipf host
    distribution, generated chain-parallel with Ray (goldens are skipped —
    correctness is proven at small scale; the bench measures throughput).
    Cached on disk; safe to call from bench.py under any num_cpus."""
    import pyarrow as pa
    import ray
    import ray.data

    from .corpus import chain_rows, make_chains

    out = corpus_dir("bench", n_chains, n_hosts, zipf_s)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    chains = make_chains(n_chains, n_hosts=n_hosts, zipf_s=zipf_s)

    def gen(batch: pa.Table) -> pa.Table:
        rows = []
        for cid in batch.column("id").to_pylist():
            rows.extend(chain_rows(chains[cid]))
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    (
        ray.data.range(n_chains)
        .map_batches(gen, batch_format="pyarrow", batch_size=8)
        .write_parquet(os.path.join(out, "pages.parquet"))
    )
    with open(done, "w") as fh:
        fh.write("ok")
    return out
