"""Parquet read wrapper that strips file-level schema metadata.

Driver-generated testdata (and anything written via pandas ``to_parquet``)
carries a ``b'pandas'`` schema-metadata entry whose decoded form contains
nested dicts; pyarrow schemas with that metadata are unhashable, so every
all-to-all reduce stage logs ``Failed to hash the schemas (for
deduplication): unhashable type: 'dict'`` storms and Ray loses its
schema-dedup fast path. ``replace_schema_metadata(None)`` is a zero-copy
metadata-only rewrite, and the strip stage fuses with the read, so blocks
enter every downstream shuffle with a stable, hashable Arrow schema.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    if t.schema.metadata:
        return t.replace_schema_metadata(None)
    return t


def read_parquet_clean(paths, **kwargs) -> "ray.data.Dataset":
    """``ray.data.read_parquet`` + zero-copy schema-metadata strip.

    The strip runs as the read's ``_block_udf`` so blocks are born clean
    INSIDE each read task — the ``ReadParquet->SplitBlocks`` block unify
    (where the warning storms originate) only ever sees hashable schemas.
    (Passing a metadata-free ``schema=`` instead is broken in Ray 2.49 when
    combined with ``columns=``: read_fragments rebuilds tables against the
    unprojected schema.) The fused map-stage strip stays as a guard for
    blocks from paths where the udf hook might not apply."""
    kwargs.setdefault("_block_udf", _strip_schema_metadata)
    return ray.data.read_parquet(paths, **kwargs).map_batches(
        _strip_schema_metadata, batch_format="pyarrow"
    )


def arrowize(ds: "ray.data.Dataset", columns: list | None = None) -> "ray.data.Dataset":
    """Re-emit a Dataset as metadata-free Arrow blocks (optionally column-
    pruned). Ray 2.49's sort/aggregate stages can emit PANDAS blocks; any
    downstream Arrow-format consumer (drop_columns, hash-join aggregators,
    pyarrow map_batches) then converts them via ``Table.from_pandas``,
    which re-attaches the unhashable ``b'pandas'`` dict metadata this
    module exists to strip. Consuming as pandas and rebuilding the Arrow
    table explicitly keeps every downstream schema hashable."""

    def to_clean(df) -> pa.Table:
        if columns is not None:
            df = df[columns]
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    return ds.map_batches(to_clean, batch_format="pandas")
