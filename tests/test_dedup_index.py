"""Persistent incremental dedup index: cross-batch exact dedup with
atomic appends (the streaming-curation state op)."""

import pandas as pd
import pytest
import ray.data as rd

from gitprov_ray import dedup_index

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(ids, texts):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series(ids, dtype="int64"),
        "text": texts}), override_num_blocks=2)


def test_incremental_dedup_across_batches(tmp_path):
    root = str(tmp_path / "idx")

    r1 = dedup_index.update(root, _docs([1, 2, 3, 4],
                                        ["aa", "bb", "aa", "cc"]))
    assert r1["novel_count"] == 3            # aa kept once (id 1 wins)
    assert r1["dropped_count"] == 1
    novel1 = r1["novel"].to_pandas().sort_values("doc_id")
    assert novel1["doc_id"].tolist() == [1, 2, 4]

    # batch 2: two re-sends, one new
    r2 = dedup_index.update(root, _docs([5, 6, 7],
                                        ["aa", "dd", "bb"]))
    assert r2["novel_count"] == 1
    assert r2["novel"].to_pandas()["text"].tolist() == ["dd"]
    assert r2["dropped_count"] == 2

    # batch 3: full re-send is a complete no-op
    r3 = dedup_index.update(root, _docs([8, 9], ["aa", "dd"]))
    assert r3["novel_count"] == 0 and r3["dropped_count"] == 2

    # the index holds exactly the four distinct hashes with first ids
    idx = dedup_index.read_index(root).to_pandas()
    assert len(idx) == 4
    assert set(idx["keep_id"]) == {1, 2, 4, 6}


def test_index_survives_empty_batch(tmp_path):
    root = str(tmp_path / "idx")
    dedup_index.update(root, _docs([1], ["xx"]))
    r = dedup_index.update(root, _docs([], []))
    assert r["novel_count"] == 0 and r["dropped_count"] == 0
    assert len(dedup_index.read_index(root).to_pandas()) == 1
