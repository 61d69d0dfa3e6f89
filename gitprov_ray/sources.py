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
            ".json": "ndjson", ".jsonl": "ndjson", ".ndjson": "ndjson",
            ".feather": "feather", ".arrow": "feather", ".ipc": "feather",
            ".orc": "orc"}


def _fmt_of(path: str, fmt: str | None) -> tuple[str, bool]:
    """(format, gzipped?) — a trailing .gz wraps any of the text formats
    (crawl interchange files usually arrive as .jsonl.gz / .csv.gz)."""
    import os

    p = str(path).lower()
    gz = p.endswith(".gz")
    if fmt:
        return fmt, gz
    if gz:
        p = p[:-3]
    ext = os.path.splitext(p)[1]
    if ext not in _EXT_FMT:
        raise ValueError(f"cannot infer table format from {path!r}; "
                         f"pass fmt= one of {sorted(set(_EXT_FMT.values()))}")
    return _EXT_FMT[ext], gz


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
    f, gz = _fmt_of(path, fmt)
    open_args = {"compression": "gzip"} if gz else {}
    if f == "parquet":
        ds = read_parquet_clean(path, columns=columns)
    elif f == "csv":
        ds = rd.read_csv(path, arrow_open_stream_args=open_args,
                         file_extensions=None)
    elif f == "ndjson":
        ds = rd.read_json(path, arrow_open_stream_args=open_args,
                          file_extensions=None)
    elif f in ("feather", "orc"):
        # Ray has no native IPC/ORC reader: read_binary_files is still
        # block-parallel ACROSS files (one decode task per file), and
        # the Arrow decode is zero-copy from the blob
        import io

        bin_ds = rd.read_binary_files(path, file_extensions=None)

        def decode(t: pa.Table, f=f, columns=columns) -> pa.Table:
            parts = []
            for blob in t.column("bytes").to_pylist():
                if f == "feather":
                    import pyarrow.feather as feather

                    parts.append(feather.read_table(
                        io.BytesIO(blob), columns=columns))
                else:
                    import pyarrow.orc as orc

                    parts.append(orc.ORCFile(io.BytesIO(blob))
                                 .read(columns=columns))
            return pa.concat_tables(parts)

        ds = bin_ds.map_batches(decode, batch_format="pyarrow",
                                batch_size=1)
    else:
        raise ValueError(f"unknown table format {f!r}")
    if f not in ("parquet", "feather", "orc") and columns is not None:
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
    elif fmt == "feather":
        import os
        import pyarrow.feather as feather

        os.makedirs(path, exist_ok=True)
        for i, batch in enumerate(ds.iter_batches(batch_format="pyarrow",
                                                  batch_size=None)):
            feather.write_feather(batch, f"{path}/part-{i:05d}.feather")
    else:
        raise ValueError(f"unknown table format {fmt!r}")


_NT_COLS = ["graph", "subj", "pred", "obj", "obj_is_literal", "obj_dtype"]


def read_ntriples(path):
    """N-Triples file(s) → Dataset of triple rows (graph, subj, pred,
    obj, obj_is_literal, obj_dtype) — the distributed twin of
    serializers.parse_ntriples, which parses one in-memory string on the
    driver. N-Triples is line-oriented, so Ray's read_text splits files
    into line blocks and the parse is block-parallel, never driver-side;
    malformed lines drop per-row (quarantine policy M15)."""
    import pandas as pd
    import ray.data as rd

    from .serializers import parse_ntriples
    from .util import tune_context

    tune_context()
    lines = rd.read_text(path)

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        rows = parse_ntriples("\n".join(df["text"]))
        out = pd.DataFrame(rows, columns=_NT_COLS)
        return out.astype({"graph": "object", "subj": "object",
                           "pred": "object", "obj": "object",
                           "obj_is_literal": "bool",
                           "obj_dtype": "object"})

    return lines.map_batches(parse, batch_format="pandas")
