"""Apache Iceberg table source/sink over the OPEN table-format spec.

An Iceberg table (iceberg.apache.org/spec — public) is parquet data
files indexed by a two-level Avro manifest tree: every *snapshot* in
``metadata/vN.metadata.json`` points at one *manifest list* (Avro),
whose rows point at *manifest files* (Avro), whose entries point at the
data files with add/existing/delete status. A Hadoop-catalog table
resolves the current metadata through ``version-hint.text``.

Everything here goes through the engine's OWN Avro object-container
codec (avrocodec.py) — no iceberg libraries — so the manifest plumbing
is real bits, not JSON stand-ins.

Scale design mirrors deltalake.py: the metadata tree is the small side
(driver-side KB/MB reads; snapshot time travel and file pruning happen
before any data I/O), the data side is plain pruned parquet through
``util.read_parquet_clean``; the writer streams one data file per
``map_batches`` task and ships only the per-file manifest rows to the
driver, which writes one manifest + one manifest list + one metadata
version atomically (tmp + rename). Single-writer by design (the
catalog's atomic version swap is the out-of-scope service part).
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa

from . import avrocodec

_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
    ]}

_MANIFEST_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},          # 0 exist 1 add 2 del
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "data_file", "fields": [
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
            ]}},
    ]}

_ARROW_TO_ICE = [
    (pa.types.is_int64, "long"), (pa.types.is_int32, "int"),
    (pa.types.is_float64, "double"), (pa.types.is_float32, "float"),
    (pa.types.is_boolean, "boolean"), (pa.types.is_string, "string"),
    (pa.types.is_large_string, "string"), (pa.types.is_binary, "binary"),
    (pa.types.is_timestamp, "timestamp"), (pa.types.is_date32, "date"),
]
_ICE_TO_ARROW = {
    "long": pa.int64(), "int": pa.int32(), "double": pa.float64(),
    "float": pa.float32(), "boolean": pa.bool_(), "string": pa.string(),
    "binary": pa.binary(), "timestamp": pa.timestamp("us"),
    "date": pa.date32(),
}


def _ice_schema(schema: pa.Schema) -> dict:
    fields = []
    for i, f in enumerate(schema):
        t = next((n for pred, n in _ARROW_TO_ICE if pred(f.type)), None)
        if t is None:
            raise NotImplementedError(f"iceberg schema: {f.type}")
        fields.append({"id": i + 1, "name": f.name, "required": False,
                       "type": t})
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _arrow_schema(spec: dict) -> pa.Schema:
    return pa.schema([(f["name"], _ICE_TO_ARROW[f["type"]])
                      for f in spec["fields"]])


def _meta_dir(table: str) -> str:
    return os.path.join(table, "metadata")


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp." + uuid.uuid4().hex[:8]
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def _current_version(table: str) -> int:
    hint = os.path.join(_meta_dir(table), "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            return int(f.read().strip())
    vs = [int(n[1:-14]) for n in os.listdir(_meta_dir(table))
          if n.startswith("v") and n.endswith(".metadata.json")
          and n[1:-14].isdigit()]
    if not vs:
        raise FileNotFoundError(f"not an iceberg table: {table}")
    return max(vs)


def _load_metadata(table: str, version: int | None = None) -> dict:
    v = _current_version(table) if version is None else version
    path = os.path.join(_meta_dir(table), f"v{v}.metadata.json")
    with open(path) as f:
        return json.load(f)


def _resolve(table: str, path: str) -> str:
    """Manifest/data paths may be table-root-relative (ours) or carry
    the table's location prefix (real catalogs)."""
    if os.path.exists(path):
        return path
    return os.path.join(table, path.split("://")[-1].lstrip("/")
                        if "://" in path else path)


def snapshot_files(table: str, snapshot_id: int | None = None,
                   metadata_version: int | None = None):
    """Resolve the live data files of a snapshot through the Avro
    manifest tree. Returns (file list, arrow schema, snapshot dict)."""
    meta = _load_metadata(table, metadata_version)
    if meta.get("format-version", 1) > 2:
        raise NotImplementedError(
            f"iceberg format-version {meta['format-version']} > 2")
    snaps = meta.get("snapshots") or []
    if not snaps:
        return [], _arrow_schema(_schema_of(meta)), None
    sid = snapshot_id if snapshot_id is not None \
        else meta["current-snapshot-id"]
    snap = next((s for s in snaps if s["snapshot-id"] == sid), None)
    if snap is None:
        raise ValueError(f"iceberg snapshot {sid} not found")
    with open(_resolve(table, snap["manifest-list"]), "rb") as f:
        manifests, _ = avrocodec.read_avro_blob(f.read())
    files = []
    for m in manifests:
        with open(_resolve(table, m["manifest_path"]), "rb") as f:
            entries, _ = avrocodec.read_avro_blob(f.read())
        for e in entries:
            if e["status"] == 2:                       # deleted
                continue
            df = e["data_file"]
            if df["file_format"].lower() != "parquet":
                raise NotImplementedError(
                    f"iceberg data file format {df['file_format']}")
            files.append(_resolve(table, df["file_path"]))
    return sorted(files), _arrow_schema(_schema_of(meta)), snap


def _schema_of(meta: dict) -> dict:
    if "schema" in meta:
        return meta["schema"]
    sid = meta.get("current-schema-id", 0)
    return next(s for s in meta["schemas"] if s["schema-id"] == sid)


def read_iceberg(table: str, columns: list[str] | None = None,
                 snapshot_id: int | None = None):
    """Read an Iceberg table (current or time-traveled snapshot) into a
    Ray Dataset — manifest tree on the driver, data as pruned parquet."""
    import ray.data as rd

    from .util import read_parquet_clean, tune_context

    tune_context()
    files, schema, _ = snapshot_files(table, snapshot_id)
    out_cols = columns if columns is not None else schema.names
    if not files:
        return rd.from_arrow(pa.table(
            {c: pa.array([], type=schema.field(c).type)
             for c in out_cols}))
    return read_parquet_clean(files, columns=list(out_cols))


def write_iceberg(ds, table: str, mode: str = "append") -> int:
    """Write a Ray Dataset as one Iceberg snapshot; returns the
    snapshot id. ``overwrite`` starts the new snapshot's manifest list
    from scratch; ``append`` carries the previous manifests forward
    (the spec's fast-append)."""
    os.makedirs(_meta_dir(table), exist_ok=True)
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        schema = base.remove_metadata()
    else:
        import numpy as np

        def _np(t):
            if isinstance(t, pa.DataType):
                return t
            dt = np.dtype(t)
            if dt.kind in ("O", "U"):
                return pa.string()
            if dt.kind == "M":
                return pa.timestamp("us")
            return pa.from_numpy_dtype(dt)
        schema = pa.schema([(n, _np(t))
                            for n, t in zip(sch.names, sch.types)])

    _manifest_schema = pa.schema([("path", pa.string()),
                                  ("size", pa.int64()),
                                  ("nrows", pa.int64())])

    def write_file(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        if batch.num_rows == 0:
            return pa.table({"path": [], "size": [], "nrows": []},
                            schema=_manifest_schema)
        rel = f"data/part-{uuid.uuid4().hex}.parquet"
        full = os.path.join(table, rel)
        pq.write_table(batch.replace_schema_metadata(None), full,
                       compression="snappy")
        return pa.table({"path": [rel],
                         "size": [os.path.getsize(full)],
                         "nrows": [batch.num_rows]},
                        schema=_manifest_schema)

    manifest_rows = ds.map_batches(
        write_file, batch_format="pyarrow").to_pandas()

    try:
        version = _current_version(table)
        meta = _load_metadata(table, version)
    except FileNotFoundError:
        version = 0
        meta = {"format-version": 1,
                "table-uuid": uuid.uuid4().hex,
                "location": table,
                "schema": _ice_schema(schema),
                "partition-spec": [], "properties": {},
                "snapshots": [], "current-snapshot-id": -1,
                "last-updated-ms": 0}
    snap_id = max((s["snapshot-id"] for s in meta["snapshots"]),
                  default=0) + 1

    entries = [{"status": 1, "snapshot_id": snap_id,
                "data_file": {"file_path": row["path"],
                              "file_format": "parquet",
                              "record_count": int(row["nrows"]),
                              "file_size_in_bytes": int(row["size"])}}
               for _, row in
               manifest_rows.sort_values("path").iterrows()]
    man_rel = f"metadata/manifest-{snap_id}-{uuid.uuid4().hex[:8]}.avro"
    man_blob = avrocodec.write_avro(entries, _MANIFEST_SCHEMA)
    _atomic_write(os.path.join(table, man_rel), man_blob)

    manifests = [{"manifest_path": man_rel,
                  "manifest_length": len(man_blob),
                  "partition_spec_id": 0,
                  "added_snapshot_id": snap_id}]
    if mode == "append" and meta["current-snapshot-id"] != -1:
        prev = next(s for s in meta["snapshots"]
                    if s["snapshot-id"] == meta["current-snapshot-id"])
        with open(_resolve(table, prev["manifest-list"]), "rb") as f:
            prev_manifests, _ = avrocodec.read_avro_blob(f.read())
        manifests = prev_manifests + manifests
    elif mode not in ("append", "overwrite"):
        raise ValueError(f"mode {mode!r}")
    ml_rel = f"metadata/snap-{snap_id}-{uuid.uuid4().hex[:8]}.avro"
    _atomic_write(os.path.join(table, ml_rel),
                  avrocodec.write_avro(manifests, _MANIFEST_LIST_SCHEMA))

    meta["snapshots"] = meta["snapshots"] + [{
        "snapshot-id": snap_id, "timestamp-ms": 0,
        "manifest-list": ml_rel,
        "summary": {"operation":
                    "append" if mode == "append" else "overwrite"}}]
    meta["current-snapshot-id"] = snap_id
    new_version = version + 1
    _atomic_write(os.path.join(_meta_dir(table),
                               f"v{new_version}.metadata.json"),
                  json.dumps(meta, indent=1).encode())
    _atomic_write(os.path.join(_meta_dir(table), "version-hint.text"),
                  str(new_version).encode())
    return snap_id
