"""Inverted-index build + boolean search over the documents table — the
text-retrieval twin of the crawl engine's bucketed fetch index
(crawl/fetchstore.py) and the ANN bucket indexes (ops/ann.py).

Build (one Dataset pass, one low-cardinality exchange): documents fan out
to (term, doc_id) posting rows inside ``map_batches`` (per-batch dedup —
each doc contributes one row per DISTINCT term), each row is routed to
``bucket = crc32(term) % num_buckets``, and the posting rows land in
bucket-partitioned Parquet. The shuffle is bounded by distinct
(term, doc) pairs, never raw token volume.

Search (a conjunctive term query): hash each query term to its bucket and
read ONLY those bucket partitions back (path-pruned scan, exactly like the
fetch index's point reads), filter to the query terms, intersect posting
lists. Cost is proportional to the queried terms' posting sizes —
independent of corpus size for selective terms.
"""

from __future__ import annotations

import os
import zlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .text import WORD_RE

INDEX_BUCKETS = 16
# registered query terms: mid-frequency at the synthetic corpus (the
# 3-way AND keeps ~272 of 500 docs at sf0.01 — discriminates, not vacuous)
SEARCH_TERMS = ("window", "merge", "scan")


def build_inverted_index(sf_dir: str, num_buckets: int = INDEX_BUCKETS) -> str:
    """Bucket-partitioned (term, doc_id) posting store; idempotent per
    (corpus, params) like build_ivf_index/build_lsh_index."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/fr_invidx/{tag}-b{num_buckets}-v1"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
        terms, docs = [], []
        for doc_id, ts in zip(df["doc_id"], toks):
            for t in set(ts):  # per-doc distinct: one posting per (term, doc)
                terms.append(t)
                docs.append(doc_id)
        pdf = pd.DataFrame({"term": terms, "doc_id": docs})
        pdf["doc_id"] = pdf["doc_id"].astype("int64")
        pdf["bucket"] = [
            zlib.crc32(t.encode("utf-8")) % num_buckets for t in pdf["term"]
        ]
        return pdf

    (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(postings, batch_format="pandas")
        .write_parquet(out, partition_cols=["bucket"])
    )
    with open(done, "w") as fh:
        fh.write("ok")
    return out


def search_and(sf_dir: str, terms=SEARCH_TERMS) -> pd.DataFrame:
    """Conjunctive (AND) term search: doc_ids containing EVERY query term.
    Reads only the query terms' bucket partitions."""
    import glob as _glob

    index_dir = build_inverted_index(sf_dir)
    terms = [t.lower() for t in terms]
    by_bucket: dict[int, list[str]] = {}
    for t in terms:
        by_bucket.setdefault(zlib.crc32(t.encode("utf-8")) % INDEX_BUCKETS, []).append(t)

    @ray.remote(num_cpus=1)
    def read_postings(files: list[str], wanted: list[str]):
        import pyarrow.parquet as pq

        t = pq.read_table(files, columns=["term", "doc_id"])
        t = t.filter(pc.is_in(t.column("term"), value_set=pa.array(wanted)))
        out = {}
        for term, doc in zip(
            t.column("term").to_pylist(), t.column("doc_id").to_pylist()
        ):
            out.setdefault(term, set()).add(doc)
        return out

    refs = []
    for b, wanted in sorted(by_bucket.items()):
        files = sorted(
            _glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet"))
        )
        if files:
            refs.append(read_postings.remote(files, sorted(wanted)))
    posting: dict[str, set] = {}
    for part in ray.get(refs):
        for term, docs in part.items():
            posting.setdefault(term, set()).update(docs)
    if any(t not in posting for t in terms):
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    hit = set.intersection(*(posting[t] for t in terms))
    return pd.DataFrame({"doc_id": sorted(hit)}).astype({"doc_id": "int64"})


def search_and_sql(terms=SEARCH_TERMS) -> str:
    conds = " AND ".join(
        f"list_contains(regexp_extract_all(lower(text), '\\S+'), '{t.lower()}')"
        for t in terms
    )
    return f"SELECT doc_id FROM documents WHERE {conds} ORDER BY doc_id"


SEARCH_AND_SQL = search_and_sql()
