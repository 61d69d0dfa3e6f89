"""Multi-format table sources: the ingestion edge of the engine.

Real corpora arrive as Parquet, CSV and NDJSON (one JSON object per
line — the Common-Crawl-adjacent interchange format); this module gives
every pipeline ONE entry point that dispatches on extension (or an
explicit ``fmt``) and lands each format on the same canonical Arrow
schema, so everything downstream is format-agnostic.

Scale shape: all three readers are Ray Data's native streaming readers
(``read_parquet`` / ``read_csv`` / ``read_json``) — block-parallel,
predicate/column-prunable at the Parquet read, no driver materialize.
The schema normalization is a zero-copy cast on each block.
"""

from __future__ import annotations

import pyarrow as pa


_EXT_FMT = {".parquet": "parquet", ".pq": "parquet", ".csv": "csv",
            ".json": "ndjson", ".jsonl": "ndjson", ".ndjson": "ndjson"}


def _fmt_of(path: str, fmt: str | None) -> str:
    if fmt:
        return fmt
    import os

    ext = os.path.splitext(str(path))[1].lower()
    if ext not in _EXT_FMT:
        raise ValueError(f"cannot infer table format from {path!r}; "
                         f"pass fmt= one of {sorted(set(_EXT_FMT.values()))}")
    return _EXT_FMT[ext]


def read_table(path, fmt: str | None = None, columns: list[str] | None = None,
               schema: pa.Schema | None = None):
    """path → ray.data.Dataset, dispatching parquet/CSV/NDJSON by
    extension. ``columns`` prunes at the read for Parquet (row groups
    never leave storage) and right after the parse for CSV/NDJSON (their
    text layout has no column projection). ``schema`` (optional) casts
    every block to the canonical dtypes — CSV/JSON type inference is
    per-file, so a multi-file read MUST pin one (int64 read as double in
    a sparse file would silently fork dtypes between blocks)."""
    import ray.data as rd

    from .util import read_parquet_clean, tune_context

    tune_context()
    f = _fmt_of(path, fmt)
    if f == "parquet":
        ds = read_parquet_clean(path, columns=columns)
    elif f == "csv":
        ds = rd.read_csv(path)
    elif f == "ndjson":
        ds = rd.read_json(path)
    else:
        raise ValueError(f"unknown table format {f!r}")
    if f != "parquet" and columns is not None:
        ds = ds.select_columns(columns)
    if schema is not None:
        want = schema if columns is None else pa.schema(
            [schema.field(c) for c in columns])

        def cast(t: pa.Table) -> pa.Table:
            return t.select(want.names).cast(want)

        ds = ds.map_batches(cast, batch_format="pyarrow")
    return ds


def write_table(ds, path: str, fmt: str = "parquet"):
    """Dataset → partitioned files at ``path`` (one file per block — the
    resumable-output layout; parquet is zstd-compressed)."""
    if fmt == "parquet":
        ds.write_parquet(path, compression="zstd")
    elif fmt == "csv":
        ds.write_csv(path)
    elif fmt == "ndjson":
        ds.write_json(path)
    else:
        raise ValueError(f"unknown table format {fmt!r}")
