"""Avro Object Container File codec (Apache Avro 1.11 spec, public):
real reader for the full binary encoding — null/boolean/int/long
(zigzag varints)/float/double/bytes/string/fixed/enum/record, block-
encoded arrays and maps, unions — with null and deflate codecs, plus a
spec-valid writer used both as the fixture generator and the
`write_table` avro sink.

Scope notes: logical types are passed through as their underlying
primitive (timestamp-micros -> int64, the Arrow cast happens via the
read_table(schema=) hook); snappy codec is a declared stub (no snappy
library in this environment); recursive (named-reference) schemas raise.

Reference parity note: the reference ingests Git/GitHub JSON over HTTP;
Avro is part of this engine's data-lake ingestion surface (SURVEY.md §2
extension), not reference parity.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

import numpy as np  # noqa: F401  (kept for symmetry with sibling codecs)

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# zigzag varint primitives (Avro spec "Binary encoding" §primitive types)
# ---------------------------------------------------------------------------

def _zz_enc(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.pos = 0

    def long(self) -> int:
        u = 0
        shift = 0
        while True:
            byte = self.b[self.pos]
            self.pos += 1
            u |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)

    def raw(self, n: int) -> bytes:
        out = self.b[self.pos:self.pos + n]
        if len(out) != n:
            raise ValueError("truncated Avro data")
        self.pos += n
        return out

    def bytes_(self) -> bytes:
        return self.raw(self.long())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


# ---------------------------------------------------------------------------
# schema-driven decode
# ---------------------------------------------------------------------------

def _decode(r: _Reader, schema):
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.raw(1) != b"\x00"
        if t in ("int", "long"):
            return r.long()
        if t == "float":
            return struct.unpack("<f", r.raw(4))[0]
        if t == "double":
            return struct.unpack("<d", r.raw(8))[0]
        if t == "bytes":
            return r.bytes_()
        if t == "string":
            return r.string()
        raise NotImplementedError(f"Avro named-type reference {t!r} "
                                  "(recursive schemas unsupported)")
    if isinstance(schema, list):                     # union: index + value
        return _decode(r, schema[r.long()])
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode(r, f["type"]) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.long()]
    if t == "fixed":
        return r.raw(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:                                # block with byte size
                n = -n
                r.long()
            for _ in range(n):
                out.append(_decode(r, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.string()               # key BEFORE value (RHS-first
                out[k] = _decode(r, schema["values"])  # evaluation trap)
    if t in ("null", "boolean", "int", "long", "float", "double",
             "bytes", "string"):
        return _decode(r, t)
    raise NotImplementedError(f"Avro type {t!r}")


def read_avro_blob(blob: bytes) -> tuple[list[dict], dict]:
    """Object Container File -> (rows, schema_json). Rows are dicts for a
    record schema (the table case), else {'value': v}."""
    if blob[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    r = _Reader(blob)
    r.pos = 4
    meta = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.string()
            meta[k] = r.bytes_()
    sync = r.raw(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r} (snappy needs "
                                  "the snappy library, not installed)")
    rows: list[dict] = []
    while r.pos < len(r.b):
        count = r.long()
        size = r.long()
        data = r.raw(size)
        if codec == "deflate":
            data = zlib.decompress(data, -15)        # raw deflate
        br = _Reader(data)
        for _ in range(count):
            v = _decode(br, schema)
            rows.append(v if isinstance(v, dict) else {"value": v})
        if r.raw(16) != sync:
            raise ValueError("Avro sync marker mismatch")
    return rows, schema


# ---------------------------------------------------------------------------
# writer (fixtures + write_table sink)
# ---------------------------------------------------------------------------

def _encode(out: bytearray, schema, v):
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out += b"\x01" if v else b"\x00"
        elif t in ("int", "long"):
            out += _zz_enc(int(v))
        elif t == "float":
            out += struct.pack("<f", float(v))
        elif t == "double":
            out += struct.pack("<d", float(v))
        elif t == "bytes":
            out += _zz_enc(len(v)) + bytes(v)
        elif t == "string":
            b = str(v).encode("utf-8")
            out += _zz_enc(len(b)) + b
        else:
            raise NotImplementedError(f"Avro type {t!r}")
        return
    if isinstance(schema, list):
        # union: pick the first matching branch (null for None, else the
        # first non-null branch — the common ["null", T] case)
        if v is None and "null" in schema:
            idx = schema.index("null")
        else:
            idx = next(i for i, s in enumerate(schema) if s != "null")
        out += _zz_enc(idx)
        _encode(out, schema[idx], v)
        return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode(out, f["type"], v[f["name"]])
    elif t == "enum":
        out += _zz_enc(schema["symbols"].index(v))
    elif t == "fixed":
        assert len(v) == schema["size"]
        out += bytes(v)
    elif t == "array":
        if v:
            out += _zz_enc(len(v))
            for item in v:
                _encode(out, schema["items"], item)
        out += _zz_enc(0)
    elif t == "map":
        if v:
            out += _zz_enc(len(v))
            for k, item in v.items():
                kb = str(k).encode()
                out += _zz_enc(len(kb)) + kb
                _encode(out, schema["values"], item)
        out += _zz_enc(0)
    else:
        _encode(out, t, v)


def write_avro(rows: list[dict], schema: dict, codec: str = "deflate",
               rows_per_block: int = 1000,
               sync: bytes = b"\x00" * 16) -> bytes:
    """rows + record schema -> spec-valid Object Container File (multiple
    blocks, so a parallel reader could split at sync markers)."""
    out = bytearray(_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    out += _zz_enc(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zz_enc(len(kb)) + kb + _zz_enc(len(v)) + v
    out += _zz_enc(0)
    out += sync
    for i in range(0, max(len(rows), 1), rows_per_block):
        chunk = rows[i:i + rows_per_block]
        if not chunk:
            break
        body = bytearray()
        for row in chunk:
            _encode(body, schema, row)
        data = bytes(body)
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = co.compress(data) + co.flush()
        out += _zz_enc(len(chunk)) + _zz_enc(len(data)) + data + sync
    return bytes(out)


def schema_for_table(table) -> dict:
    """pyarrow Table -> Avro record schema for the writer (the subset of
    Arrow types the engine's tables use)."""
    import pyarrow as pa

    def conv(t) -> object:
        if pa.types.is_int64(t) or pa.types.is_int32(t):
            return "long"
        if pa.types.is_floating(t):
            return "double"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "string"
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return "bytes"
        if pa.types.is_boolean(t):
            return "boolean"
        if pa.types.is_timestamp(t):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if pa.types.is_list(t):
            return {"type": "array", "items": conv(t.value_type)}
        raise NotImplementedError(f"no Avro mapping for Arrow type {t}")

    return {"type": "record", "name": "row",
            "fields": [{"name": f.name, "type": conv(f.type)}
                       for f in table.schema]}


def table_to_avro(table, codec: str = "deflate") -> bytes:
    """pyarrow Table -> Avro bytes (timestamps as micros since epoch)."""
    import pyarrow as pa

    schema = schema_for_table(table)
    cols = {}
    for f in table.schema:
        c = table.column(f.name)
        if pa.types.is_timestamp(f.type):
            c = c.cast(pa.timestamp("us")).cast(pa.int64())
        cols[f.name] = c.to_pylist()
    rows = [{k: cols[k][i] for k in cols} for i in range(table.num_rows)]
    return write_avro(rows, schema, codec=codec)
