"""Content-fingerprinted /tmp index caches.

Every derived-index builder (IVF/LSH buckets, shingle blobs, chunk-drop
index, inverted postings, pagerank edges, fetch index) caches under /tmp
keyed by corpus path + params with a ``_DONE`` marker. Keying by PATH alone
is wrong: regenerating a corpus in-place at the same path would silently
reuse the stale index and return wrong neighbors/pairs. So the ``_DONE``
payload carries a cheap content fingerprint of the source parquet files
(name + size + mtime_ns — no data read) and the cache is rebuilt whenever
it disagrees.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil


def source_fingerprint(*paths: str, extra: str = "") -> str:
    """Cheap content fingerprint of parquet source(s): per-file
    name:size:mtime_ns, md5'd. ``extra`` folds in builder params/version."""
    parts = [extra]
    for p in paths:
        if os.path.isdir(p):
            files = sorted(
                glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
            )
        else:
            files = sorted(glob.glob(p)) or [p]
        for f in files:
            try:
                st = os.stat(f)
                parts.append(f"{os.path.relpath(f, p)}:{st.st_size}:{st.st_mtime_ns}")
            except OSError:
                parts.append(f"{f}:missing")
    return hashlib.md5("|".join(parts).encode("utf-8")).hexdigest()[:16]


def cache_valid(out_dir: str, fp: str) -> bool:
    """True iff ``out_dir/_DONE`` exists and records exactly ``fp``.
    A stale or fingerprint-less marker invalidates the whole cache dir."""
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        with open(done) as fh:
            if fh.read().strip() == fp:
                return True
        shutil.rmtree(out_dir, ignore_errors=True)
    return False


def mark_done(out_dir: str, fp: str) -> None:
    with open(os.path.join(out_dir, "_DONE"), "w") as fh:
        fh.write(fp)
