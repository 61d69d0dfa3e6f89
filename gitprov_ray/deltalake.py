"""Delta Lake table source/sink over the OPEN transaction-log protocol.

A Delta table is a directory of parquet data files plus ``_delta_log/``,
an ordered sequence of JSON commits (``%020d.json``) whose line-delimited
*actions* (``metaData`` / ``protocol`` / ``add`` / ``remove`` /
``commitInfo``) define the logical table state, periodically compacted
into a ``%020d.checkpoint.parquet`` referenced by ``_last_checkpoint``
(delta.io PROTOCOL.md — public spec; no delta libraries involved).

Scale design:
  * the LOG is the small side — snapshot resolution (checkpoint +
    tail-replay) is a driver-side read of a few KB/MB, and every file
    pruned there (``partition_filter``, time travel ``version=``) never
    leaves storage;
  * the DATA is read as plain parquet through
    ``util.read_parquet_clean`` with column pruning, one Ray read per
    partition-value group, unioned lazily — partition columns are NOT in
    the data files (per spec) and are injected as constants per group;
  * the writer streams: each ``map_batches`` task writes its own data
    file(s) and returns a manifest ROW, so only the manifest (one row
    per file) ever reaches the driver, which then appends one atomic
    (tmp + rename) JSON commit. Single-writer by design — the optimistic
    multi-writer rename race of the real service is out of scope.

Reference surface parity: the reference stores KG output in a
single-directory TDB-backed store (gitprov_ray/store.py mirrors it);
this module is the lakehouse-native alternative sink/source the
100 TB deployment would use for tabular intermediates.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa

LOG_DIR = "_delta_log"

# Spark-JSON schema type names <-> arrow (the subset our tables use)
_ARROW_TO_SPARK = [
    (pa.types.is_int64, "long"), (pa.types.is_int32, "integer"),
    (pa.types.is_int16, "short"), (pa.types.is_int8, "byte"),
    (pa.types.is_float64, "double"), (pa.types.is_float32, "float"),
    (pa.types.is_boolean, "boolean"), (pa.types.is_binary, "binary"),
    (pa.types.is_large_binary, "binary"),
    (pa.types.is_timestamp, "timestamp"), (pa.types.is_date32, "date"),
    (pa.types.is_string, "string"), (pa.types.is_large_string, "string"),
]
_SPARK_TO_ARROW = {
    "long": pa.int64(), "integer": pa.int32(), "short": pa.int16(),
    "byte": pa.int8(), "double": pa.float64(), "float": pa.float32(),
    "boolean": pa.bool_(), "binary": pa.binary(), "date": pa.date32(),
    "timestamp": pa.timestamp("us"), "string": pa.string(),
}


def _spark_type(t: pa.DataType) -> str:
    for pred, name in _ARROW_TO_SPARK:
        if pred(t):
            return name
    raise NotImplementedError(f"delta schema: unsupported arrow type {t}")


def _schema_string(schema: pa.Schema) -> str:
    fields = [{"name": f.name, "type": _spark_type(f.type),
               "nullable": True, "metadata": {}} for f in schema]
    return json.dumps({"type": "struct", "fields": fields})


def _parse_schema_string(s: str) -> pa.Schema:
    spec = json.loads(s)
    return pa.schema([(f["name"], _SPARK_TO_ARROW[f["type"]])
                      for f in spec["fields"]])


def _log_path(table: str, version: int) -> str:
    return os.path.join(table, LOG_DIR, "%020d.json" % version)


def _list_versions(table: str):
    d = os.path.join(table, LOG_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.endswith(".json") and name[:-5].isdigit():
            out.append(int(name[:-5]))
    return sorted(out)


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp." + uuid.uuid4().hex[:8]
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


# ---------------------------------------------------------------------------
# snapshot resolution (log replay)
# ---------------------------------------------------------------------------

class Snapshot:
    def __init__(self):
        self.files: dict[str, dict] = {}     # rel path -> add action
        self.tombstones: dict[str, dict] = {}
        self.metadata: dict | None = None
        self.protocol: dict | None = None
        self.version: int = -1

    def apply(self, action: dict) -> None:
        if "add" in action:
            a = action["add"]
            self.files[a["path"]] = a
            self.tombstones.pop(a["path"], None)
        elif "remove" in action:
            r = action["remove"]
            self.files.pop(r["path"], None)
            self.tombstones[r["path"]] = r
        elif "metaData" in action:
            self.metadata = action["metaData"]
        elif "protocol" in action:
            self.protocol = action["protocol"]
        # commitInfo / txn: informational


def _read_checkpoint(table: str, version: int, snap: Snapshot) -> None:
    import pyarrow.parquet as pq

    cp = os.path.join(table, LOG_DIR,
                      "%020d.checkpoint.parquet" % version)
    t = pq.read_table(cp)
    for row in t.to_pylist():
        for key in ("protocol", "metaData", "add", "remove"):
            v = row.get(key)
            if v is not None:
                if key in ("add", "remove") and isinstance(
                        v.get("partitionValues"), list):
                    v["partitionValues"] = dict(v["partitionValues"])
                snap.apply({key: v})
    snap.version = version


def snapshot(table: str, version: int | None = None) -> Snapshot:
    """Resolve the table state at ``version`` (default: latest) —
    checkpoint seed + ordered tail replay, all driver-side small I/O."""
    versions = _list_versions(table)
    if not versions:
        raise FileNotFoundError(f"not a delta table (no {LOG_DIR}): {table}")
    target = versions[-1] if version is None else version
    if target not in versions:
        raise ValueError(f"delta version {target} not in log "
                         f"(have {versions[0]}..{versions[-1]})")
    snap = Snapshot()
    start = 0
    lc = os.path.join(table, LOG_DIR, "_last_checkpoint")
    if os.path.exists(lc):
        with open(lc) as f:
            meta = json.load(f)
        if meta["version"] <= target:
            _read_checkpoint(table, meta["version"], snap)
            start = meta["version"] + 1
    for v in versions:
        if start <= v <= target:
            with open(_log_path(table, v)) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        snap.apply(json.loads(line))
            snap.version = v
    if snap.protocol and snap.protocol.get("minReaderVersion", 1) > 1:
        raise NotImplementedError(
            "delta minReaderVersion %d > 1 (deletion vectors / column "
            "mapping not supported)" % snap.protocol["minReaderVersion"])
    if snap.metadata is None:
        raise ValueError(f"delta log has no metaData action: {table}")
    return snap


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def read_delta(table: str, columns: list[str] | None = None,
               version: int | None = None, partition_filter=None):
    """Read a Delta table into a Ray Dataset.

    ``partition_filter``: callable ``dict[str,str] -> bool`` over each
    file's partitionValues — files pruned here are never opened.
    ``version``: time travel to that commit.
    """
    import ray.data as rd

    from .util import read_parquet_clean, tune_context

    tune_context()
    snap = snapshot(table, version)
    schema = _parse_schema_string(snap.metadata["schemaString"])
    part_cols = list(snap.metadata.get("partitionColumns") or [])
    out_cols = columns if columns is not None else schema.names
    data_cols = [c for c in out_cols if c not in part_cols]

    groups: dict[tuple, list[str]] = {}
    for relpath, add in snap.files.items():
        pv = add.get("partitionValues") or {}
        if partition_filter is not None and not partition_filter(pv):
            continue
        key = tuple(sorted(pv.items()))
        groups.setdefault(key, []).append(os.path.join(table, relpath))

    if not groups:
        empty = pa.table(
            {c: pa.array([], type=schema.field(c).type) for c in out_cols})
        return rd.from_arrow(empty)

    def inject(pvals):
        # partitionValues are strings per spec; cast to the declared type
        consts = {c: pa.array([v]).cast(schema.field(c).type)[0].as_py()
                  for c, v in pvals.items() if c in out_cols}

        def f(batch: pa.Table) -> pa.Table:
            for c, v in consts.items():
                batch = batch.append_column(
                    c, pa.array([v] * batch.num_rows,
                                type=schema.field(c).type))
            return batch.select(out_cols)
        return f

    parts = []
    for key, paths in sorted(groups.items()):
        ds = read_parquet_clean(sorted(paths),
                                columns=data_cols or None)
        pvals = dict(key)
        if any(c in out_cols for c in pvals) or data_cols != out_cols:
            ds = ds.map_batches(inject(pvals), batch_format="pyarrow")
        parts.append(ds)
    out = parts[0]
    if len(parts) > 1:
        out = out.union(*parts[1:])
    return out


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def write_delta(ds, table: str, mode: str = "append",
                partition_cols: list[str] | None = None):
    """Write a Ray Dataset as one Delta commit; returns the version.

    ``mode="overwrite"`` emits remove actions for every current file in
    the same commit (the spec's atomic replace). Each write task streams
    its batch to its own data file and returns ONE manifest row; only
    the manifest reaches the driver.
    """
    part_cols = list(partition_cols or [])
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        schema = base.remove_metadata()
    else:  # pandas-backed blocks report numpy dtypes
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
    for c in part_cols:
        if c not in schema.names:
            raise ValueError(f"partition column {c!r} not in schema")
    data_names = [n for n in schema.names if n not in part_cols]
    os.makedirs(os.path.join(table, LOG_DIR), exist_ok=True)

    versions = _list_versions(table)
    new_version = (versions[-1] + 1) if versions else 0
    prior = snapshot(table) if (versions and mode == "overwrite") else None
    if versions and mode not in ("append", "overwrite"):
        raise ValueError(f"mode {mode!r}")

    _manifest_schema = pa.schema([
        ("path", pa.string()), ("pvals", pa.string()),
        ("size", pa.int64()), ("nrows", pa.int64())])

    def write_file(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        rows = {"path": [], "pvals": [], "size": [], "nrows": []}
        if batch.num_rows == 0:
            return pa.table(rows, schema=_manifest_schema)
        if part_cols:
            key = pa.table({c: batch[c] for c in part_cols}).to_pandas()
            grp = key.groupby(part_cols, sort=False).indices
            items = [({c: str(k[i] if isinstance(k, tuple) else k)
                       for i, c in enumerate(part_cols)}, idx)
                     for k, idx in grp.items()]
        else:
            items = [({}, None)]
        for pvals, idx in items:
            sub = batch if idx is None else batch.take(idx)
            sub = sub.select(data_names)
            sub = sub.replace_schema_metadata(None)
            rel_dir = "/".join(f"{c}={pvals[c]}" for c in part_cols)
            name = f"part-{uuid.uuid4().hex}.snappy.parquet"
            rel = f"{rel_dir}/{name}" if rel_dir else name
            full = os.path.join(table, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            pq.write_table(sub, full, compression="snappy")
            rows["path"].append(rel)
            rows["pvals"].append(json.dumps(pvals, sort_keys=True))
            rows["size"].append(os.path.getsize(full))
            rows["nrows"].append(sub.num_rows)
        return pa.table(rows, schema=_manifest_schema)

    manifest = ds.map_batches(write_file,
                              batch_format="pyarrow").to_pandas()

    actions = []
    if new_version == 0 or mode == "overwrite":
        actions.append({"protocol": {"minReaderVersion": 1,
                                     "minWriterVersion": 2}})
        actions.append({"metaData": {
            "id": uuid.uuid4().hex,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string(schema),
            "partitionColumns": part_cols,
            "configuration": {}, "createdTime": 0}})
    actions.append({"commitInfo": {
        "operation": "WRITE", "operationParameters": {"mode": mode},
        "engineInfo": "gitprov_ray"}})
    if prior is not None:
        for rel in sorted(prior.files):
            actions.append({"remove": {"path": rel,
                                       "deletionTimestamp": 0,
                                       "dataChange": True}})
    for _, row in manifest.sort_values("path").iterrows():
        actions.append({"add": {
            "path": row["path"],
            "partitionValues": json.loads(row["pvals"]),
            "size": int(row["size"]), "modificationTime": 0,
            "dataChange": True,
            "stats": json.dumps({"numRecords": int(row["nrows"])})}})
    body = "\n".join(json.dumps(a) for a in actions).encode()
    _atomic_write(_log_path(table, new_version), body)
    return new_version


def delete_where(table: str, partition_filter) -> int:
    """Partition-level DELETE: one commit removing every current file
    whose partitionValues satisfy the predicate (no data rewrite — the
    lakehouse fast path). Returns the new version."""
    snap = snapshot(table)
    victims = [rel for rel, add in sorted(snap.files.items())
               if partition_filter(add.get("partitionValues") or {})]
    new_version = snap.version + 1
    actions = [{"commitInfo": {"operation": "DELETE",
                               "engineInfo": "gitprov_ray"}}]
    actions += [{"remove": {"path": rel, "deletionTimestamp": 0,
                            "dataChange": True}} for rel in victims]
    _atomic_write(_log_path(table, new_version),
                  "\n".join(json.dumps(a) for a in actions).encode())
    return new_version


def checkpoint(table: str) -> int:
    """Compact the log at the current version into
    ``%020d.checkpoint.parquet`` + ``_last_checkpoint`` so readers skip
    the JSON tail (spec checkpoint layout: one nullable action struct
    per column, one row per action; tombstones retained)."""
    import pyarrow.parquet as pq

    snap = snapshot(table)
    pv_t = pa.map_(pa.string(), pa.string())
    add_t = pa.struct([("path", pa.string()), ("partitionValues", pv_t),
                       ("size", pa.int64()),
                       ("modificationTime", pa.int64()),
                       ("dataChange", pa.bool_()),
                       ("stats", pa.string())])
    rm_t = pa.struct([("path", pa.string()),
                      ("deletionTimestamp", pa.int64()),
                      ("dataChange", pa.bool_())])
    meta_t = pa.struct([("id", pa.string()), ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("createdTime", pa.int64())])
    proto_t = pa.struct([("minReaderVersion", pa.int32()),
                         ("minWriterVersion", pa.int32())])

    adds = [dict(a, partitionValues=list(
        (a.get("partitionValues") or {}).items()),
        stats=a.get("stats"))
        for _, a in sorted(snap.files.items())]
    adds = [{k: a.get(k) for k in
             ("path", "partitionValues", "size", "modificationTime",
              "dataChange", "stats")} for a in adds]
    rms = [{k: r.get(k) for k in ("path", "deletionTimestamp",
                                  "dataChange")}
           for _, r in sorted(snap.tombstones.items())]
    md = {k: snap.metadata.get(k) for k in
          ("id", "schemaString", "partitionColumns", "createdTime")}
    proto = snap.protocol or {"minReaderVersion": 1, "minWriterVersion": 2}
    proto = {"minReaderVersion": proto.get("minReaderVersion", 1),
             "minWriterVersion": proto.get("minWriterVersion", 2)}

    n = 2 + len(adds) + len(rms)
    col = {
        "protocol": [proto] + [None] * (n - 1),
        "metaData": [None, md] + [None] * (n - 2),
        "add": [None, None] + adds + [None] * len(rms),
        "remove": [None] * (2 + len(adds)) + rms,
    }
    t = pa.table({"protocol": pa.array(col["protocol"], type=proto_t),
                  "metaData": pa.array(col["metaData"], type=meta_t),
                  "add": pa.array(col["add"], type=add_t),
                  "remove": pa.array(col["remove"], type=rm_t)})
    cp = os.path.join(table, LOG_DIR,
                      "%020d.checkpoint.parquet" % snap.version)
    pq.write_table(t, cp)
    _atomic_write(os.path.join(table, LOG_DIR, "_last_checkpoint"),
                  json.dumps({"version": snap.version,
                              "size": n}).encode())
    return snap.version
