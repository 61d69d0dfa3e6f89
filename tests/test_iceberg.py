"""Iceberg table format: snapshot append/overwrite through the engine's
own Avro manifest tree, time travel, version-hint resolution."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gitprov_ray import avrocodec
from gitprov_ray import iceberg as ice


def _ds(ids, langs):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": pd.Series(ids, dtype="int64"),
        "lang": pd.Series(langs, dtype=str)}), preserve_index=False))


def _read_ids(table, **kw):
    return sorted(ice.read_iceberg(table, **kw)
                  .to_pandas()["doc_id"].tolist())


def test_append_overwrite_time_travel(ray_session, tmp_path):
    tbl = str(tmp_path / "t")
    s1 = ice.write_iceberg(_ds([1, 2], ["en", "de"]), tbl)
    s2 = ice.write_iceberg(_ds([3], ["fr"]), tbl, mode="append")
    assert _read_ids(tbl) == [1, 2, 3]
    assert _read_ids(tbl, snapshot_id=s1) == [1, 2]
    s3 = ice.write_iceberg(_ds([9], ["pt"]), tbl, mode="overwrite")
    assert _read_ids(tbl) == [9]
    assert _read_ids(tbl, snapshot_id=s2) == [1, 2, 3]
    assert s3 == 3
    # the manifest tree is REAL avro object container files
    meta = ice._load_metadata(tbl)
    ml = os.path.join(tbl, meta["snapshots"][-1]["manifest-list"])
    with open(ml, "rb") as f:
        rows, schema = avrocodec.read_avro_blob(f.read())
    assert schema["name"] == "manifest_file" and len(rows) == 1
    with open(os.path.join(tbl, rows[0]["manifest_path"]), "rb") as f:
        entries, _ = avrocodec.read_avro_blob(f.read())
    assert entries[0]["status"] == 1
    assert entries[0]["data_file"]["file_format"] == "parquet"
    assert entries[0]["data_file"]["record_count"] == 1


def test_version_hint_and_column_pruning(ray_session, tmp_path):
    tbl = str(tmp_path / "t2")
    ice.write_iceberg(_ds([4, 5], ["en", "en"]), tbl)
    hint = os.path.join(tbl, "metadata", "version-hint.text")
    assert open(hint).read() == "1"
    got = ice.read_iceberg(tbl, columns=["lang"]).to_pandas()
    assert list(got.columns) == ["lang"]
    # hint missing → fall back to max vN.metadata.json
    os.remove(hint)
    assert _read_ids(tbl) == [4, 5]


def test_guards(ray_session, tmp_path):
    with pytest.raises(FileNotFoundError):
        ice.read_iceberg(str(tmp_path / "nope"))
    tbl = str(tmp_path / "t3")
    ice.write_iceberg(_ds([1], ["en"]), tbl)
    with pytest.raises(ValueError, match="snapshot 99"):
        ice.read_iceberg(tbl, snapshot_id=99)
