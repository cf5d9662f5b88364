"""Bucketed fetch index: the rebuild's "HTTP fetcher" (S2/J3).

fetch(url) in the reference is a live GET (funda_spider.py:148-156); here it
is a hash-join of the round's request set against the Parquet pages table.
Both sides can be huge, so the table is **bucketized once** by
``crc32(url_norm) % B`` into one directory per bucket (the co-partitioning
exchange of SURVEY.md §7.4). Every later round touches only the buckets its
requests hash into, with an ``isin`` row filter pushed into the scan — the
html column never crosses a shuffle (SURVEY.md §7.5.6): extraction runs in
the same stage that reads it.
"""

from __future__ import annotations

import os
import zlib

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray
import ray.data

from .canonicalize import canonicalize_url

DEFAULT_BUCKETS = 32


def bucket_of(url_norm: str, num_buckets: int) -> int:
    return zlib.crc32(url_norm.encode("utf-8"), 0xB0C4) % num_buckets


def build_fetch_index(
    pages_path: str, out_dir: str, num_buckets: int = DEFAULT_BUCKETS
) -> str:
    """One-time exchange: pages → bucket=K/ Parquet dirs keyed by url_norm.
    Idempotent via _DONE marker. Columns kept: url_norm, url, html (the only
    ones the fetch-join serves; `text`/`lang` stay in the source table)."""
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    def add_bucket(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        norms = [canonicalize_url(u) for u in urls]
        buckets = pa.array([bucket_of(n, num_buckets) for n in norms], pa.int32())
        return pa.table(
            {
                "bucket": buckets,
                "url_norm": pa.array(norms, pa.string()),
                "url": t.column("url"),
                "html": t.column("html"),
            }
        )

    ds = ray.data.read_parquet(pages_path, columns=["url", "html"])
    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    with open(done, "w") as fh:
        fh.write(str(num_buckets))
    return out_dir


def index_num_buckets(index_dir: str) -> int:
    with open(os.path.join(index_dir, "_DONE")) as fh:
        return int(fh.read().strip())


def fetch_pages(
    index_dir: str, url_norms: list[str], columns: list[str] | None = None
) -> ray.data.Dataset:
    """Read exactly the requested pages: bucket-pruned paths + isin pushdown.
    Missing URLs simply produce no rows (a live 404); callers diff request
    vs result sets to count fetch misses."""
    num_buckets = index_num_buckets(index_dir)
    wanted = sorted(set(url_norms))
    by_bucket: dict[int, list[str]] = {}
    for n in wanted:
        by_bucket.setdefault(bucket_of(n, num_buckets), []).append(n)
    import glob as _glob

    paths = []
    for b in sorted(by_bucket):
        d = os.path.join(index_dir, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(sorted(_glob.glob(os.path.join(d, "*.parquet"))))
    if not paths:
        return ray.data.from_items([])
    filt = pc.is_in(pads.field("url_norm"), value_set=pa.array(wanted, pa.string()))
    return ray.data.read_parquet(paths, columns=columns or ["url_norm", "url", "html"], filter=filt)
