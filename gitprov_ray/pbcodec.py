"""Protocol Buffers wire-format record source/sink (no protobuf libs).

Implements the PUBLIC proto3 wire format (protobuf.dev/programming-guides
/encoding): varint keys ``(field_no << 3) | wire_type``, wire types
0 (varint), 1 (64-bit), 2 (length-delimited), 5 (32-bit), zigzag for
``sint*``, little-endian IEEE-754 for ``double``/``float``, UTF-8 for
``string``, nested messages as length-delimited payloads, and packed
repeated scalars. Streams use the standard length-delimited framing
(a varint byte length before each message — the ``writeDelimitedTo``
convention), so a file of records is splittable by sequential walk.

Schemas are plain dicts — ``{field_no: (name, kind)}`` with kinds
``int64 | sint64 | bool | double | float | string | bytes``, a
``("message", subschema)`` pair for nesting, or ``("repeated", kind)``
— mirroring what a .proto compiler would emit, minus the codegen.
Unknown fields are skipped by wire type (the spec's forward-compat
rule), so readers tolerate schema evolution.
"""

from __future__ import annotations

import struct


def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v &= (1 << 64) - 1                    # two's-complement 64-bit
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(b: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        if pos >= len(b):
            raise ValueError("protobuf: truncated varint")
        c = b[pos]
        pos += 1
        v |= (c & 0x7F) << shift
        if not (c & 0x80):
            return v, pos
        shift += 7
        if shift > 63:
            raise ValueError("protobuf: varint too long")


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


_WIRE = {"int64": 0, "sint64": 0, "bool": 0, "double": 1,
         "float": 5, "string": 2, "bytes": 2}


def encode_message(msg: dict, schema: dict) -> bytes:
    """dict → proto3 message bytes (fields in ascending field number;
    None/absent fields are omitted per proto3 presence rules)."""
    out = bytearray()
    for fno in sorted(schema):
        name, kind = schema[fno]
        if name not in msg or msg[name] is None:
            continue
        val = msg[name]
        if isinstance(kind, tuple) and kind[0] == "repeated":
            ekind = kind[1]
            if isinstance(ekind, tuple) and ekind[0] == "message":
                for item in val:
                    body = encode_message(item, ekind[1])
                    _write_varint(out, (fno << 3) | 2)
                    _write_varint(out, len(body))
                    out += body
            elif _WIRE[ekind] == 2:           # repeated strings/bytes
                for item in val:
                    _encode_scalar(out, fno, ekind, item)
            else:                             # packed scalars (proto3)
                body = bytearray()
                for item in val:
                    _encode_packed(body, ekind, item)
                _write_varint(out, (fno << 3) | 2)
                _write_varint(out, len(body))
                out += body
            continue
        if isinstance(kind, tuple) and kind[0] == "message":
            body = encode_message(val, kind[1])
            _write_varint(out, (fno << 3) | 2)
            _write_varint(out, len(body))
            out += body
            continue
        _encode_scalar(out, fno, kind, val)
    return bytes(out)


def _encode_packed(out: bytearray, kind: str, val) -> None:
    if kind == "int64":
        _write_varint(out, int(val))
    elif kind == "sint64":
        _write_varint(out, _zigzag(int(val)))
    elif kind == "bool":
        _write_varint(out, 1 if val else 0)
    elif kind == "double":
        out += struct.pack("<d", float(val))
    elif kind == "float":
        out += struct.pack("<f", float(val))
    else:
        raise ValueError(f"protobuf: kind {kind} is not packable")


def _encode_scalar(out: bytearray, fno: int, kind: str, val) -> None:
    wt = _WIRE[kind]
    _write_varint(out, (fno << 3) | wt)
    if wt == 0:
        _encode_packed(out, kind, val)
    elif wt == 1:
        out += struct.pack("<d", float(val))
    elif wt == 5:
        out += struct.pack("<f", float(val))
    else:
        data = val.encode("utf-8") if kind == "string" else bytes(val)
        _write_varint(out, len(data))
        out += data


def _skip(b: bytes, pos: int, wt: int) -> int:
    """Skip an unknown field by wire type (forward compatibility)."""
    if wt == 0:
        _, pos = _read_varint(b, pos)
        return pos
    if wt == 1:
        return pos + 8
    if wt == 5:
        return pos + 4
    if wt == 2:
        n, pos = _read_varint(b, pos)
        return pos + n
    raise ValueError(f"protobuf: reserved wire type {wt}")


def decode_message(b: bytes, schema: dict) -> dict:
    """proto3 message bytes → dict (repeated fields accumulate; packed
    and unpacked encodings both accepted; unknown fields skipped)."""
    out: dict = {}
    for fno, (name, kind) in schema.items():
        if isinstance(kind, tuple) and kind[0] == "repeated":
            out[name] = []
    pos = 0
    while pos < len(b):
        key, pos = _read_varint(b, pos)
        fno, wt = key >> 3, key & 7
        if fno not in schema:
            pos = _skip(b, pos, wt)
            continue
        name, kind = schema[fno]
        repeated = isinstance(kind, tuple) and kind[0] == "repeated"
        ekind = kind[1] if repeated else kind
        if isinstance(ekind, tuple) and ekind[0] == "message":
            n, pos = _read_varint(b, pos)
            val = decode_message(b[pos:pos + n], ekind[1])
            pos += n
            if repeated:
                out[name].append(val)
            else:
                out[name] = val
            continue
        if repeated and wt == 2 and _WIRE[ekind] != 2:   # packed
            n, pos = _read_varint(b, pos)
            end = pos + n
            while pos < end:
                val, pos = _decode_scalar_at(b, pos, ekind, _WIRE[ekind])
                out[name].append(val)
            continue
        val, pos = _decode_scalar_at(b, pos, ekind, wt)
        if repeated:
            out[name].append(val)
        else:
            out[name] = val
    return out


def _decode_scalar_at(b: bytes, pos: int, kind: str, wt: int):
    if wt == 0:
        v, pos = _read_varint(b, pos)
        if kind == "sint64":
            return _unzigzag(v), pos
        if kind == "bool":
            return bool(v), pos
        return _signed64(v), pos
    if wt == 1:
        return struct.unpack("<d", b[pos:pos + 8])[0], pos + 8
    if wt == 5:
        return struct.unpack("<f", b[pos:pos + 4])[0], pos + 4
    if wt == 2:
        n, pos = _read_varint(b, pos)
        data = b[pos:pos + n]
        if len(data) != n:
            raise ValueError("protobuf: truncated length-delimited field")
        return (data.decode("utf-8") if kind == "string"
                else bytes(data)), pos + n
    raise ValueError(f"protobuf: wire type {wt} for kind {kind}")


def write_delimited(msgs: list[dict], schema: dict) -> bytes:
    """Messages → length-delimited stream (varint size framing)."""
    out = bytearray()
    for m in msgs:
        body = encode_message(m, schema)
        _write_varint(out, len(body))
        out += body
    return bytes(out)


def read_delimited(blob: bytes, schema: dict) -> list[dict]:
    """Length-delimited stream → list of dicts."""
    out = []
    pos = 0
    while pos < len(blob):
        n, pos = _read_varint(blob, pos)
        if pos + n > len(blob):
            raise ValueError("protobuf: truncated framed message")
        out.append(decode_message(blob[pos:pos + n], schema))
        pos += n
    return out
