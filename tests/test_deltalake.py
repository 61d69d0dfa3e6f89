"""Delta Lake log protocol: write commits / partition delete /
checkpoint / time travel / partition pruning, all through the engine's
own log replay — no delta libraries."""

import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import pytest

from gitprov_ray import deltalake as dl


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _frame(ids, types):
    return pd.DataFrame({
        "event_id": pd.Series(ids, dtype="int64"),
        "event_type": pd.Series(types, dtype=str),
        "value": pd.Series([i * 0.5 for i in ids], dtype="float64")})


def _ds(df):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _read_df(table, **kw):
    return (dl.read_delta(table, **kw).to_pandas()
            .sort_values("event_id").reset_index(drop=True))


def test_append_overwrite_roundtrip(ray_session, table):
    v0 = dl.write_delta(_ds(_frame([1, 2], ["a", "b"])), table)
    assert v0 == 0
    v1 = dl.write_delta(_ds(_frame([3], ["a"])), table, mode="append")
    assert v1 == 1
    got = _read_df(table)
    assert got["event_id"].tolist() == [1, 2, 3]
    # overwrite replaces everything in one atomic commit
    dl.write_delta(_ds(_frame([9], ["z"])), table, mode="overwrite")
    got = _read_df(table)
    assert got["event_id"].tolist() == [9]
    assert got["event_type"].tolist() == ["z"]
    # time travel back before the overwrite
    got1 = _read_df(table, version=1)
    assert got1["event_id"].tolist() == [1, 2, 3]


def test_partitioned_delete_checkpoint_prune(ray_session, table):
    df = _frame(range(1, 9),
                ["a", "b", "a", "b", "err", "err", "a", "err"])
    dl.write_delta(_ds(df), table, partition_cols=["event_type"])
    # partition columns live in the LOG, not the data files
    data_files = [p for p in
                  __import__("glob").glob(table + "/**/*.parquet",
                                          recursive=True)
                  if dl.LOG_DIR not in p]
    import pyarrow.parquet as pq
    assert all("event_type" not in pq.read_schema(p).names
               for p in data_files)
    assert any("event_type=err" in p for p in data_files)

    dl.write_delta(_ds(_frame([10], ["err"])), table, mode="append",
                   partition_cols=["event_type"])
    # partition-level DELETE: remove actions only, no rewrite
    dl.delete_where(table, lambda pv: pv.get("event_type") == "err")
    got = _read_df(table)
    assert got["event_id"].tolist() == [1, 2, 3, 4, 7]
    assert "err" not in set(got["event_type"])

    # checkpoint compacts; readers seed from it + replay the tail
    cpv = dl.checkpoint(table)
    assert os.path.exists(os.path.join(
        table, dl.LOG_DIR, "%020d.checkpoint.parquet" % cpv))
    dl.write_delta(_ds(_frame([11], ["b"])), table, mode="append",
                   partition_cols=["event_type"])
    got = _read_df(table)
    assert got["event_id"].tolist() == [1, 2, 3, 4, 7, 11]

    # prove the checkpoint is actually USED: hide the pre-checkpoint json
    for v in range(cpv + 1):
        os.rename(dl._log_path(table, v), dl._log_path(table, v) + ".bak")
    try:
        got2 = _read_df(table)
        assert got2["event_id"].tolist() == [1, 2, 3, 4, 7, 11]
    finally:
        for v in range(cpv + 1):
            os.rename(dl._log_path(table, v) + ".bak",
                      dl._log_path(table, v))

    # partition pruning never opens the pruned files
    only_b = _read_df(table,
                      partition_filter=lambda pv:
                      pv.get("event_type") == "b")
    assert only_b["event_id"].tolist() == [2, 4, 11]
    # column pruning composes with partition-column injection
    cols = dl.read_delta(table, columns=["event_type", "event_id"])
    assert cols.schema().names == ["event_type", "event_id"]


def test_reader_guards(ray_session, table, tmp_path):
    with pytest.raises(FileNotFoundError):
        dl.snapshot(str(tmp_path / "nope"))
    dl.write_delta(_ds(_frame([1], ["a"])), table)
    with pytest.raises(ValueError):
        dl.snapshot(table, version=7)
    # refuse protocol versions we cannot honor (spec requirement)
    with open(dl._log_path(table, 1), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 3,
                                         "minWriterVersion": 7}}))
    with pytest.raises(NotImplementedError):
        dl.snapshot(table)


def test_empty_result_schema(ray_session, table):
    dl.write_delta(_ds(_frame([1], ["a"])), table,
                   partition_cols=["event_type"])
    empty = dl.read_delta(table,
                          partition_filter=lambda pv: False)
    assert empty.count() == 0
    assert set(empty.schema().names) == {"event_id", "event_type",
                                         "value"}
    shutil.rmtree(table)
