"""Resume semantics (SURVEY.md §5.2-4): cold run == resumed run, stage skip
works, partial store completion is resumed per partition."""

import shutil

import pytest


@pytest.mark.usefixtures("ray_session")
def test_cold_then_resume_identical(tmp_path):
    from gitprov_ray import checkpoint, store

    SF = "/root/testdata/sf0.001"
    wd = str(tmp_path / "run")
    r1 = checkpoint.run_flagship(SF, wd, num_buckets=8)
    assert r1["resumed"] == []
    cold = store.read_store(r1["store"]).to_pandas()

    r2 = checkpoint.run_flagship(SF, wd, num_buckets=8)
    assert set(r2["resumed"]) == {"revisions", "triples"}
    warm = store.read_store(r2["store"]).to_pandas()
    assert set(zip(cold.graph, cold.subj, cold.pred, cold.obj)) == \
           set(zip(warm.graph, warm.subj, warm.pred, warm.obj))
    assert r1["triples"] == r2["triples"]


@pytest.mark.usefixtures("ray_session")
def test_resume_after_partial_store_loss(tmp_path):
    from gitprov_ray import checkpoint, store

    SF = "/root/testdata/sf0.001"
    wd = str(tmp_path / "run")
    r1 = checkpoint.run_flagship(SF, wd, num_buckets=8)
    full = store.read_store(r1["store"]).to_pandas()

    # simulate a crashed run: drop two graph partitions
    graphs = store.list_graphs(r1["store"])
    import os
    for g in graphs[:2]:
        shutil.rmtree(os.path.join(r1["store"], "gpart=" + g))
    assert len(store.list_graphs(r1["store"])) == len(graphs) - 2

    r2 = checkpoint.run_flagship(SF, wd, num_buckets=8)
    # revisions stage skipped; triples recomputed only for missing graphs
    assert "revisions" in r2["resumed"]
    back = store.read_store(r2["store"]).to_pandas()
    assert set(zip(back.graph, back.subj, back.pred, back.obj)) == \
           set(zip(full.graph, full.subj, full.pred, full.obj))


@pytest.mark.usefixtures("ray_session")
def test_config_change_invalidates(tmp_path):
    from gitprov_ray import checkpoint

    SF = "/root/testdata/sf0.001"
    wd = str(tmp_path / "run")
    checkpoint.run_flagship(SF, wd, num_buckets=8)
    r2 = checkpoint.run_flagship(SF, wd, num_buckets=16)
    assert r2["resumed"] == []  # fingerprint embeds config
