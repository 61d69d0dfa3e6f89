"""Protobuf wire format (pbcodec): published-encoding vectors, zigzag,
packed repeated, nested messages, unknown-field skip, and the
length-delimited source/sink through read_table/write_table."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gitprov_ray import pbcodec as pb
from gitprov_ray import sources

SCHEMA = {1: ("id", "int64"), 2: ("name", "string"),
          3: ("score", "double"), 4: ("flag", "bool"),
          5: ("delta", "sint64"),
          6: ("tags", ("repeated", "string")),
          7: ("vals", ("repeated", "int64")),
          8: ("meta", ("message", {1: ("k", "string"),
                                   2: ("v", "int64")}))}


def test_published_encoding_vectors():
    """The protobuf.dev worked examples: field 1 varint 150 encodes as
    08 96 01; field 2 string 'testing' as 12 07 74...67."""
    assert pb.encode_message({"a": 150}, {1: ("a", "int64")}) == \
        bytes([0x08, 0x96, 0x01])
    assert pb.encode_message({"b": "testing"}, {2: ("b", "string")}) == \
        bytes([0x12, 0x07]) + b"testing"
    # zigzag: 0→0, -1→1, 1→2, -2→3 (spec table)
    for v, z in ((0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647,
                                                    4294967294)):
        assert pb._zigzag(v) == z
        assert pb._unzigzag(z) == v


def test_roundtrip_all_kinds():
    msg = {"id": 7, "name": "café", "score": 2.5, "flag": True,
           "delta": -42, "tags": ["x", "y"], "vals": [1, -2, 300],
           "meta": {"k": "lang", "v": 9}}
    blob = pb.encode_message(msg, SCHEMA)
    back = pb.decode_message(blob, SCHEMA)
    assert back == msg
    # negative int64 survives the two's-complement varint path
    assert pb.decode_message(pb.encode_message({"id": -5}, SCHEMA),
                             SCHEMA)["id"] == -5


def test_packed_repeated_and_unpacked_accepted():
    msg = {"vals": [1, 2, 128, -1]}
    blob = pb.encode_message(msg, SCHEMA)
    # packed: ONE length-delimited field for the whole list
    assert blob[0] == (7 << 3) | 2
    assert pb.decode_message(blob, SCHEMA)["vals"] == [1, 2, 128, -1]
    # writer-side unpacked form (proto2 style) must also decode
    unpacked = bytearray()
    for v in (5, 6):
        pb._write_varint(unpacked, (7 << 3) | 0)
        pb._write_varint(unpacked, v)
    assert pb.decode_message(bytes(unpacked), SCHEMA)["vals"] == [5, 6]


def test_unknown_fields_skipped():
    """Forward compat: a reader with an older schema skips new fields
    by wire type."""
    wide = dict(SCHEMA)
    wide[99] = ("extra", "string")
    blob = pb.encode_message({"id": 3, "extra": "ignored"}, wide)
    assert pb.decode_message(blob, SCHEMA) == {
        "id": 3, "tags": [], "vals": []}


def test_delimited_stream_roundtrip():
    msgs = [{"id": i, "name": f"n{i}", "tags": [], "vals": [i, i * 2]}
            for i in range(5)]
    blob = pb.write_delimited(msgs, SCHEMA)
    assert pb.read_delimited(blob, SCHEMA) == msgs
    with pytest.raises(ValueError, match="truncated"):
        pb.read_delimited(blob[:-2], SCHEMA)


def test_read_write_table_pb(ray_session, tmp_path):
    import ray.data as rd

    flat = {1: ("event_id", "int64"), 2: ("event_type", "string"),
            3: ("value", "double")}
    df = pd.DataFrame({
        "event_id": pd.Series(range(20), dtype="int64"),
        "event_type": [f"t{i % 3}" for i in range(20)],
        "value": [i * 0.25 for i in range(20)]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = str(tmp_path / "events_pb")
    sources.write_table(ds, out, fmt="pb", pb_schema=flat)
    back = (sources.read_table(out, fmt="pb", pb_schema=flat)
            .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert back["event_id"].tolist() == list(range(20))
    assert back["event_type"].tolist() == df["event_type"].tolist()
    assert np.allclose(back["value"], df["value"])
    with pytest.raises(ValueError, match="pb_schema"):
        sources.read_table(out, fmt="pb")
