"""Resumable partitioned Parquet sink (sources/partitioned_sink.py):
roundtrip fidelity vs the DuckDB oracle, idempotent skip, crash-redo, and
manifest-scoped reads (orphan files from a differently-blocked dead run
are invisible)."""

import json
import os
import shutil

import duckdb
import pandas as pd
import pytest

from fundamental_ray.sources.parquet import read_parquet_clean
from fundamental_ray.sources.partitioned_sink import (
    MANIFEST,
    read_partitioned,
    sink_roundtrip,
    SINK_ROUNDTRIP_SQL,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"
OUT = "/tmp/fr_sink_test"


def _write(out=OUT):
    return write_partitioned(
        read_parquet_clean(
            f"{SF}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        ),
        out,
        key="source",
        id_col="doc_id",
    )


@pytest.fixture()
def clean_out():
    shutil.rmtree(OUT, ignore_errors=True)
    yield
    shutil.rmtree(OUT, ignore_errors=True)


def test_roundtrip_matches_oracle(ray_session):
    got = sink_roundtrip(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(SINK_ROUNDTRIP_SQL).fetchdf()
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def test_skip_and_crash_redo(ray_session, clean_out):
    first = _write()
    assert not first["skipped"]
    man = json.load(open(os.path.join(OUT, MANIFEST)))
    paths = [f["path"] for f in man["files"]]
    mtimes = {p: os.path.getmtime(os.path.join(OUT, p)) for p in paths}

    second = _write()
    assert second["skipped"]
    assert second["rows"] == first["rows"]
    for p in paths:  # skipped write touched nothing
        assert os.path.getmtime(os.path.join(OUT, p)) == mtimes[p]

    # crash simulation: manifest missing -> full redo, same results
    os.remove(os.path.join(OUT, MANIFEST))
    # an orphan file from a differently-blocked dead run must be ignored
    orphan_dir = os.path.join(OUT, "source=web")
    os.makedirs(orphan_dir, exist_ok=True)
    pd.DataFrame({"doc_id": [10**9], "n_chars": [1]}).to_parquet(
        os.path.join(orphan_dir, "part-999999999999.parquet"), index=False
    )
    third = _write()
    assert not third["skipped"]
    assert third["rows"] == first["rows"]

    back = read_partitioned(OUT).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert len(back) == len(docs)  # orphan row is manifest-invisible
    assert int(back["n_chars"].sum()) == int(docs["n_chars"].sum())
    assert sorted(back["doc_id"]) == sorted(docs["doc_id"])


def test_read_refuses_uncommitted_tree(ray_session, clean_out):
    os.makedirs(OUT, exist_ok=True)
    with pytest.raises(FileNotFoundError):
        read_partitioned(OUT)


def test_compaction_preserves_data_and_shrinks_files(ray_session, clean_out):
    from fundamental_ray.sources.partitioned_sink import compact_partitioned

    res = write_partitioned(
        read_parquet_clean(
            f"{SF}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        ).repartition(8),
        OUT,
        key="source",
        id_col="doc_id",
    )
    assert res["files"] > len(set(pd.read_parquet(f"{SF}/documents.parquet")["source"]))
    stats = compact_partitioned(OUT)
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows"] == res["rows"]
    # one file per partition at this scale (everything under target_rows)
    man = json.load(open(os.path.join(OUT, MANIFEST)))
    per_dir = {}
    for f in man["files"]:
        per_dir.setdefault(os.path.dirname(f["path"]), []).append(f)
    assert all(len(v) == 1 for v in per_dir.values())
    # old small files physically gone; data intact
    back = read_partitioned(OUT).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert sorted(back["doc_id"]) == sorted(docs["doc_id"])
    on_disk = {
        os.path.relpath(os.path.join(r, fn), OUT)
        for r, _, fns in os.walk(OUT)
        for fn in fns
        if fn.endswith(".parquet")
    }
    assert on_disk == {f["path"] for f in man["files"]}


def test_search_or_not_oracle(ray_session):
    import duckdb

    from fundamental_ray.ops.index import (
        SEARCH_OR_NOT_SQL,
        SEARCH_OR_TERMS,
        SEARCH_NOT_TERM,
        search_and,
        search_or_not,
    )

    got = search_or_not(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(SEARCH_OR_NOT_SQL).fetchdf()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert len(got) > 0
    # OR/NOT semantics versus the AND query: conjunction of all three
    # terms is excluded from the result (the NOT binds)
    both = search_and(SF, terms=(*SEARCH_OR_TERMS, SEARCH_NOT_TERM))
    assert not set(both["doc_id"]) & set(got["doc_id"])
