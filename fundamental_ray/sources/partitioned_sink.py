"""Resumable hive-partitioned Parquet sink.

The generic form of the output contract the crawl store already honours
(crawl/frontier.py's per-round ``_COMMITTED`` markers): large results are
written as ONE DIRECTORY PER PARTITION KEY with many files per partition —
never one giant file — and a run that dies mid-write can be re-executed
without corrupting or duplicating output.

Reference parity: the reference persists scraped listings into a SQLite
upsert store (FundaMental database.go); this sink is the Ray-native bulk
analogue for corpus-sized results where a row store is the wrong shape.

Design (idempotent re-execution + atomic manifest commit):
- the write is ONE streaming ``map_batches`` pass — every task splits its
  batch by key and writes ``key=<value>/part-<min_id>.parquet`` for each
  key it saw. Within a key the batches partition the id space, so
  ``min_id`` is unique per (key, batch): a RETRIED task overwrites its own
  files byte-identically instead of appending duplicates (Ray task retry
  safety), and no two tasks ever collide on a file name.
- nothing under the output dir is readable until ``_MANIFEST`` lands: the
  manifest (the file list + row counts) is written to a temp name and
  ``os.rename``d — atomic on POSIX — only after the full pass succeeds.
- resume: if ``_MANIFEST`` exists and every listed file still does, the
  write is skipped entirely; a missing/partial tree (killed run) is
  re-executed from scratch, safely, because file names are deterministic
  and the manifest is last. Partition-level (finer) resume is the crawl
  frontier's per-round ``_COMMITTED`` pattern — use that when the job has
  natural rounds.

At 100 TB: tasks stream (no driver materialization; the driver only sees
per-task manifests, ~bytes per file), partitions hold many files so hot
keys don't serialize into one writer, and the id-ordered file names give
range-pruned point reads within a partition.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from fundamental_ray.sources.parquet import read_parquet_clean

MANIFEST = "_MANIFEST"


def write_partitioned(
    ds, out_dir: str, key: str, id_col: str
) -> dict:
    """Write ``ds`` under ``out_dir`` as ``key=<value>/part-<min_id>.parquet``
    files with an atomic manifest commit. Returns ``{"files": n,
    "rows": n, "skipped": bool}``. Idempotent: a complete previous write
    (valid manifest) is skipped; an incomplete one is redone in place."""
    man_path = os.path.join(out_dir, MANIFEST)
    if os.path.exists(man_path):
        with open(man_path) as fh:
            man = json.load(fh)
        if all(
            os.path.exists(os.path.join(out_dir, f["path"])) for f in man["files"]
        ):
            return {
                "files": len(man["files"]),
                "rows": sum(f["rows"] for f in man["files"]),
                "skipped": True,
            }
        os.remove(man_path)  # stale manifest from a changed tree: redo

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(df: pd.DataFrame) -> pd.DataFrame:
        # normalize pandas Categorical columns (Ray hands low-cardinality
        # string columns over as categoricals after some exchanges) so
        # every part file writes plain types and multi-file reads unify
        for c in df.columns:
            if isinstance(df[c].dtype, pd.CategoricalDtype):
                df = df.assign(**{c: df[c].astype(df[c].cat.categories.dtype)})
        recs = []
        for kval, part in df.groupby(key, sort=False):
            pdir = os.path.join(out_dir, f"{key}={kval}")
            os.makedirs(pdir, exist_ok=True)
            rel = os.path.join(
                f"{key}={kval}", f"part-{int(part[id_col].min()):012d}.parquet"
            )
            tmp = os.path.join(out_dir, rel + ".tmp")
            # the key column stays IN the file (redundant with the dir
            # name) so a committed tree reads back as ONE read_parquet
            # over the manifest's file list instead of a per-partition
            # union of read stages
            part.to_parquet(tmp, index=False)
            os.replace(tmp, os.path.join(out_dir, rel))  # atomic per file
            recs.append({"path": rel, "rows": len(part)})
        return pd.DataFrame({"rec": [json.dumps(r) for r in recs]})

    recs = ds.map_batches(write_batch, batch_format="pandas").to_pandas()
    files = sorted((json.loads(r) for r in recs["rec"]), key=lambda f: f["path"])
    tmp = man_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"files": files}, fh)
    os.replace(tmp, man_path)  # commit point: readers may now trust the tree
    return {
        "files": len(files),
        "rows": sum(f["rows"] for f in files),
        "skipped": False,
    }


def read_partitioned(out_dir: str):
    """Read a committed partitioned tree back as ONE Dataset over the
    manifest's file list (the key column is stored in the files).
    Refuses an uncommitted tree."""
    man_path = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(man_path):
        raise FileNotFoundError(f"{out_dir} has no {MANIFEST}: incomplete write")
    with open(man_path) as fh:
        man = json.load(fh)
    return read_parquet_clean(
        [os.path.join(out_dir, f["path"]) for f in man["files"]]
    )


def sink_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Registry query: write documents hive-partitioned by source (atomic
    manifest commit, fingerprinted cache), read the tree back, and return
    per-source (n_docs, n_chars) — the roundtrip-fidelity contract. The
    oracle aggregates the ORIGINAL table, so any write/read corruption,
    row loss or duplication hash-mismatches."""
    from ray.data.aggregate import Count, Sum

    from fundamental_ray.state.diskcache import source_fingerprint

    src = f"{sf_dir}/documents.parquet"
    fp = source_fingerprint(src, extra="sink-v2")
    out_dir = f"/tmp/fr_sink/{fp}"
    write_partitioned(
        read_parquet_clean(src, columns=["doc_id", "source", "n_chars"]),
        out_dir,
        key="source",
        id_col="doc_id",
    )
    return (
        read_partitioned(out_dir)
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="n_chars"))
        .to_pandas()  # source-bounded
        .astype({"n_docs": "int64", "n_chars": "int64"})
        .sort_values("source")
        .reset_index(drop=True)
    )


SINK_ROUNDTRIP_SQL = """
SELECT source, COUNT(*)::BIGINT AS n_docs, SUM(n_chars)::BIGINT AS n_chars
FROM documents GROUP BY source ORDER BY source
"""


def compact_partitioned(out_dir: str, target_rows: int = 1_000_000) -> dict:
    """Small-file compaction for a committed tree — the maintenance pass
    every long-lived partitioned store needs (a 100-TB sink accretes one
    file per (key, batch); readers want few large files). Per partition,
    input files are coalesced in id order into runs of ≈``target_rows``
    and rewritten as ``compact-<min_id>.parquet`` by one Ray task per
    output file (partitions compact in parallel; a giant partition still
    parallelizes across its runs). The NEW manifest swaps in atomically
    (os.replace) and old files are removed only after the swap — a crash
    anywhere leaves either the old or the new manifest in force, and
    manifest-scoped reads never see orphans."""
    import pyarrow.parquet as pq

    import ray as _ray

    man_path = os.path.join(out_dir, MANIFEST)
    with open(man_path) as fh:
        man = json.load(fh)
    by_part: dict[str, list[dict]] = {}
    for f in man["files"]:
        by_part.setdefault(os.path.dirname(f["path"]), []).append(f)

    import pyarrow as pa

    def _undict(t: "pa.Table") -> "pa.Table":
        # pandas Categorical blocks (Ray repartition of low-cardinality
        # string columns) write dictionary<string> parquet columns while
        # other batches write plain string — cast to the value type so
        # multi-file reads unify
        for i, f in enumerate(t.schema):
            if pa.types.is_dictionary(f.type):
                t = t.set_column(
                    i, f.name, t.column(i).cast(f.type.value_type)
                )
        return t

    @_ray.remote(num_cpus=1)
    def compact_run(paths: list[str], rel_out: str) -> dict:
        t = pa.concat_tables(
            _undict(pq.read_table(os.path.join(out_dir, p))) for p in paths
        )
        tmp = os.path.join(out_dir, rel_out + ".tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(out_dir, rel_out))
        return {"path": rel_out, "rows": t.num_rows}

    plans = []  # (input paths, output rel path) per output file
    keep = []  # files already at/above target: carried over untouched
    for pdir, files in sorted(by_part.items()):
        files = sorted(files, key=lambda f: f["path"])  # id order
        run: list[dict] = []
        run_rows = 0
        for f in files:
            run.append(f)
            run_rows += f["rows"]
            if run_rows >= target_rows:
                plans.append(run)
                run, run_rows = [], 0
        if run:
            plans.append(run)
    out_files = []
    refs = []
    for run in plans:
        if len(run) == 1:  # nothing to merge: carry over
            keep.append(run[0])
            continue
        pdir = os.path.dirname(run[0]["path"])
        min_id = os.path.basename(run[0]["path"]).split("-")[1].split(".")[0]
        refs.append(
            compact_run.remote(
                [f["path"] for f in run],
                os.path.join(pdir, f"compact-{min_id}.parquet"),
            )
        )
    out_files.extend(_ray.get(refs))
    old_paths = {f["path"] for f in man["files"]}
    new_files = sorted(keep + out_files, key=lambda f: f["path"])
    tmp = man_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"files": new_files}, fh)
    os.replace(tmp, man_path)  # commit: new layout now in force
    for p in old_paths - {f["path"] for f in new_files}:
        os.remove(os.path.join(out_dir, p))  # post-commit cleanup
    return {
        "files_before": len(man["files"]),
        "files_after": len(new_files),
        "rows": sum(f["rows"] for f in new_files),
    }


def sink_compacted_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Registry query: write documents partitioned by source in MANY
    small files (forced via repartition), compact each partition, read
    the compacted tree back and aggregate — fidelity through the
    write → compact → read chain vs the oracle over the original table."""
    from ray.data.aggregate import Count, Sum

    from fundamental_ray.state.diskcache import source_fingerprint

    src = f"{sf_dir}/documents.parquet"
    fp = source_fingerprint(src, extra="sink-compact-v1")
    out_dir = f"/tmp/fr_sink/{fp}"
    res = write_partitioned(
        read_parquet_clean(src, columns=["doc_id", "source", "n_chars"])
        .repartition(8),
        out_dir,
        key="source",
        id_col="doc_id",
    )
    if not res["skipped"]:
        compact_partitioned(out_dir)
    return (
        read_partitioned(out_dir)
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="n_chars"))
        .to_pandas()  # source-bounded
        .astype({"n_docs": "int64", "n_chars": "int64"})
        .sort_values("source")
        .reset_index(drop=True)
    )
