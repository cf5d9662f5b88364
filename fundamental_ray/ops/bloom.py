"""Bloom-filter delta dedup — the Dolma "BFF" (Bloom Filter Filtering)
shape: a constant-size bit array built over the BASE corpus's chunk
hashes, broadcast once, probed by every DELTA document with zero shuffle.

This is the third point on the repo's dedup cost/exactness frontier
(exact hash join = dedup_incremental; bucketed disk index = minhash
verify): when even a hash→keep index is too large to join against per
delta shard, production pipelines (Dolma/BFF, CCNet's hash splits) accept
a bounded false-positive rate in exchange for a FIXED-SIZE membership
structure. Here the filter is ``BLOOM_M`` bits (2 MiB packed) regardless
of corpus size; at 100 TB you shard the filter by position range across
actors and tree-OR per-shard bitmaps — the probe side stays shuffle-free
either way because membership is a pure broadcast lookup.

Determinism contract: double hashing h_i = (h1 + i·h2odd) mod M with
h1/h2 taken from the md5 hex of the chunk (the repo-wide deterministic
hash), so the SQL oracle reproduces the EXACT filter — false positives
included — as a distinct-position set: a delta chunk "hits" iff all K of
its positions appear among the base positions. No probabilistic slack is
hidden from the oracle.

Scale shape: pass 1 (build) emits per-batch DISTINCT positions — narrow
uint32 rows bounded by min(#chunks·K, M), never corpus text — and the
global distinct is bounded by M (≤16.8M rows) independent of corpus
size; pass 2 (probe) is a single map_batches with NO exchange at all:
chunking, hashing and the per-doc hit tally all resolve inside the row's
own batch against the ray.put bitmap.

Reference anchor: the URL-seen membership problem of the crawler
(crawl/seen.py cuckoo shards) applied at document-chunk granularity —
same claim-before-fetch economics, content-defined instead of URL-keyed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from fundamental_ray.sources.parquet import read_parquet_clean

BLOOM_W = 8  # words per chunk (non-overlapping fixed windows)
BLOOM_M = 1 << 24  # filter bits (2 MiB packed) — sized for ~0.3% fill at sf0.1
BLOOM_K = 3  # probes per chunk
BLOOM_DUP_FRAC = 0.8  # doc flagged dup when >= 80% of its chunks hit


def _chunks(text) -> list[str]:
    # Null texts are filtered out by callers BEFORE this (matching the SQL
    # oracle, where string_split(NULL) unnests to zero rows so the doc
    # vanishes); str() guards any residual non-string (NaN is truthy, so
    # `text or ''` alone would not).
    w = ("" if text is None else str(text)).split(" ")
    return [" ".join(w[i : i + BLOOM_W]) for i in range(0, len(w), BLOOM_W)]


def _positions(chunk: str) -> np.ndarray:
    """K filter positions via double hashing over the md5 hex — mirrored
    literally in the SQL oracle (h2 forced odd so probes never collapse)."""
    hx = hashlib.md5(chunk.encode("utf-8")).hexdigest()
    h1 = int(hx[:8], 16)
    h2 = int(hx[8:16], 16) * 2 + 1
    return (h1 + np.arange(BLOOM_K, dtype=np.int64) * h2) % BLOOM_M


def bloom_delta_dedup(
    sf_dir: str, split_mod: int = 2, delta_residue: int = 1
) -> pd.DataFrame:
    """Per-DELTA-doc Bloom membership report against the BASE filter.

    Base = documents with doc_id % split_mod != delta_residue, delta =
    the residue class (default 2/1: even base, odd delta — a
    deterministic split standing in for "committed corpus" + "incoming
    shard", the dedup_incremental convention; clean_corpus_delta passes
    5/0 to align with the incremental-dedup split). Returns one row per
    delta doc: (doc_id, n_chunks, n_hits, dup_frac, is_dup)."""
    import ray

    from ..pipelines.analytics import r2

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    # ---- pass 1: distinct base positions -> packed bitmap -----------------
    def base_positions(df: pd.DataFrame) -> pa.Table:
        df = df[(df["doc_id"] % split_mod != delta_residue) & df["text"].notna()]
        pos: list[np.ndarray] = [np.empty(0, dtype=np.int64)]
        for t in df["text"]:
            pos.extend(_positions(c) for c in _chunks(t))
        u = np.unique(np.concatenate(pos))  # per-batch combiner
        return pa.table({"pos": pa.array(u, type=pa.int64())})

    from ray.data.aggregate import Count

    distinct = (
        docs.map_batches(base_positions, batch_format="pandas")
        .groupby("pos")
        .aggregate(Count(alias_name="n"))
        .to_pandas()["pos"]
        .to_numpy(np.int64)
    )
    bits = np.zeros(BLOOM_M, dtype=bool)
    bits[distinct] = True
    packed_ref = ray.put(np.packbits(bits))  # 2 MiB, broadcast once

    # ---- pass 2: probe delta docs (no exchange) ---------------------------
    def probe(df: pd.DataFrame) -> pd.DataFrame:
        # Null-text delta docs are dropped, matching the oracle where
        # string_split(NULL) unnests to zero rows and the doc never appears.
        df = df[(df["doc_id"] % split_mod == delta_residue) & df["text"].notna()]
        packed = ray.get(packed_ref)
        out = {"doc_id": [], "n_chunks": [], "n_hits": []}
        for d, t in zip(df["doc_id"], df["text"]):
            ch = _chunks(t)
            p = np.stack([_positions(c) for c in ch])  # (n_chunks, K)
            hit = (packed[p >> 3] >> (7 - (p & 7))) & 1
            out["doc_id"].append(int(d))
            out["n_chunks"].append(len(ch))
            out["n_hits"].append(int(hit.all(axis=1).sum()))
        res = pd.DataFrame(out).astype(
            {"doc_id": "int64", "n_chunks": "int64", "n_hits": "int64"}
        )
        frac = r2(res["n_hits"] / res["n_chunks"].clip(lower=1), 4)
        res["dup_frac"] = frac
        res["is_dup"] = frac >= BLOOM_DUP_FRAC
        return res

    return (
        docs.map_batches(probe, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def bloom_delta_sql(split_mod: int = 2, delta_residue: int = 1) -> str:
    return f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         unnest(range(len(string_split(text, ' ')))) AS wi
  FROM documents
),
ch AS (
  SELECT doc_id, wi // {BLOOM_W} AS ci,
         string_agg(word, ' ' ORDER BY wi) AS chunk
  FROM w GROUP BY doc_id, wi // {BLOOM_W}
),
h AS (
  SELECT doc_id, ci, chunk,
         ('0x' || substr(md5(chunk), 1, 8))::BIGINT AS h1,
         ('0x' || substr(md5(chunk), 9, 8))::BIGINT * 2 + 1 AS h2
  FROM ch
),
base_pos AS (
  SELECT DISTINCT (h1 + i.i * h2) % {BLOOM_M} AS pos
  FROM h CROSS JOIN (SELECT unnest(range({BLOOM_K})) AS i) i
  WHERE doc_id % {split_mod} != {delta_residue}
),
probe AS (
  SELECT h.doc_id, h.ci,
         COUNT(b.pos) = {BLOOM_K} AS hit
  FROM h CROSS JOIN (SELECT unnest(range({BLOOM_K})) AS i) i
  LEFT JOIN base_pos b ON b.pos = (h.h1 + i.i * h.h2) % {BLOOM_M}
  WHERE h.doc_id % {split_mod} = {delta_residue}
  GROUP BY h.doc_id, h.ci
)
SELECT doc_id,
       COUNT(*)::BIGINT AS n_chunks,
       COUNT(*) FILTER (hit)::BIGINT AS n_hits,
       ROUND(COUNT(*) FILTER (hit)::DOUBLE / COUNT(*), 4) AS dup_frac,
       ROUND(COUNT(*) FILTER (hit)::DOUBLE / COUNT(*), 4) >= {BLOOM_DUP_FRAC}
         AS is_dup
FROM probe
GROUP BY doc_id
ORDER BY doc_id
"""


# back-compat alias (registry _bloom_subq embeds the default split)
BLOOM_DELTA_SQL = bloom_delta_sql()
