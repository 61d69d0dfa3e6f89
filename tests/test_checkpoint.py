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


def test_run_flagship_refuses_incremental_workdir(ray_session, tiny_corpus,
                                                  tmp_path):
    """ADVICE r2 (medium): run_flagship on a workdir that update_flagship
    merged batches into must refuse (not silently wipe the merged store);
    fresh=True explicitly rebuilds. Incremental fingerprints are
    deterministic: same batch chain → same fingerprint."""
    import pyarrow as pa
    import ray.data as rd

    from gitprov_ray import checkpoint, schemas, store, synth
    from gitprov_ray.pipelines import flagship as fl

    pages, _, _ = tiny_corpus
    pdf = pages.to_pandas().sort_values(["url", "warc_ts"], kind="mergesort")
    first = pdf.drop_duplicates("url", keep="first")
    rest = pdf[~pdf.index.isin(first.index)]
    to_tbl = lambda d: pa.Table.from_pandas(d.reset_index(drop=True),
                                            schema=schemas.PAGES,
                                            preserve_index=False)
    graphs = sorted({u.split("/")[2] for u in pdf["url"]})
    contributors = synth.contributors_for_sources(graphs).to_pylist()

    import json
    import os

    fps = []
    for name in ("wd1", "wd2"):
        wd = str(tmp_path / name)
        os.makedirs(wd)
        revs = fl.revisions_from_pages(rd.from_arrow(to_tbl(first)))
        checkpoint._write_stage(revs, wd, "revisions", "init")
        tri = fl.triples_from_revisions(
            checkpoint._read_stage(wd, "revisions"), contributors,
            num_buckets=4)
        store.write_store(tri, f"{wd}/triples_store", fingerprint="init")
        checkpoint.update_flagship(wd, rd.from_arrow(to_tbl(rest)),
                                   num_buckets=4)
        with open(checkpoint._manifest_path(wd, "revisions")) as f:
            fps.append(json.load(f)["fingerprint"])
    assert fps[0] == fps[1] and fps[0].startswith("incremental-")

    wd = str(tmp_path / "wd1")
    with pytest.raises(ValueError, match="incremental state"):
        checkpoint.run_flagship("/root/testdata/sf0.001", wd, num_buckets=4)
    # merged store untouched by the refused call
    assert store.list_graphs(f"{wd}/triples_store")
    # fresh=True rebuilds from the base corpus without error
    r = checkpoint.run_flagship("/root/testdata/sf0.001", wd, num_buckets=4,
                                fresh=True)
    assert r["triples"] > 0 and r["resumed"] == []


def test_incremental_resend_does_not_grow_checkpoint(ray_session, tiny_corpus,
                                                     tmp_path):
    """ADVICE r2 (low): re-sending a batch must not duplicate rows in the
    revisions checkpoint."""
    import pyarrow as pa
    import ray.data as rd

    from gitprov_ray import checkpoint, schemas, store, synth
    from gitprov_ray.pipelines import flagship as fl

    pages, _, _ = tiny_corpus
    pdf = pages.to_pandas().sort_values(["url", "warc_ts"], kind="mergesort")
    first = pdf.drop_duplicates("url", keep="first")
    rest = pdf[~pdf.index.isin(first.index)]
    to_tbl = lambda d: pa.Table.from_pandas(d.reset_index(drop=True),
                                            schema=schemas.PAGES,
                                            preserve_index=False)
    graphs = sorted({u.split("/")[2] for u in pdf["url"]})
    contributors = synth.contributors_for_sources(graphs).to_pylist()

    import os
    wd = str(tmp_path / "wd")
    os.makedirs(wd)
    revs = fl.revisions_from_pages(rd.from_arrow(to_tbl(first)))
    checkpoint._write_stage(revs, wd, "revisions", "init")
    tri = fl.triples_from_revisions(
        checkpoint._read_stage(wd, "revisions"), contributors, num_buckets=4)
    store.write_store(tri, f"{wd}/triples_store", fingerprint="init")

    checkpoint.update_flagship(wd, rd.from_arrow(to_tbl(rest)), num_buckets=4)
    n1 = checkpoint._read_stage(wd, "revisions").count()
    checkpoint.update_flagship(wd, rd.from_arrow(to_tbl(rest)), num_buckets=4)
    n2 = checkpoint._read_stage(wd, "revisions").count()
    assert n1 == n2  # re-send deduped, checkpoint stable


def test_incremental_update_matches_full_run(ray_session, tiny_corpus, tmp_path):
    """update_flagship: first-snapshot batch, then the rest — the merged
    store must equal a full run over all pages (version chains span the
    batches), and re-sending the update batch must be a no-op."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gitprov_ray import checkpoint, schemas, store, synth
    from gitprov_ray.pipelines import flagship as fl

    pages, _, _ = tiny_corpus
    pdf = pages.to_pandas().sort_values(["url", "warc_ts"], kind="mergesort")
    first = pdf.drop_duplicates("url", keep="first")
    rest = pdf[~pdf.index.isin(first.index)]
    assert len(rest) > 0
    to_tbl = lambda d: pa.Table.from_pandas(d.reset_index(drop=True),
                                            schema=schemas.PAGES,
                                            preserve_index=False)

    graphs = sorted({u.split("/")[2] for u in pdf["url"]})
    contributors = synth.contributors_for_sources(graphs).to_pylist()

    workdir = str(tmp_path / "wd")
    import os
    os.makedirs(workdir, exist_ok=True)
    revsA = fl.revisions_from_pages(rd.from_arrow(to_tbl(first)))
    checkpoint._write_stage(revsA, workdir, "revisions", "init")
    triA = fl.triples_from_revisions(checkpoint._read_stage(workdir, "revisions"),
                                     contributors, num_buckets=4)
    store.write_store(triA, f"{workdir}/triples_store", fingerprint="init")

    res = checkpoint.update_flagship(workdir, rd.from_arrow(to_tbl(rest)),
                                     num_buckets=4)
    assert res["new_events"] > 0 and res["triples_written"] > 0

    got = store.read_store(f"{workdir}/triples_store").to_pandas()
    full = fl.triples_from_pages(rd.from_arrow(pages), contributors,
                                 num_buckets=4).to_pandas()
    key = ["graph", "subj", "pred", "obj"]
    assert set(map(tuple, got[key].itertuples(index=False))) == \
        set(map(tuple, full[key].itertuples(index=False)))
    assert len(got) == len(full)

    # idempotence: re-sending the same batch leaves the store identical
    checkpoint.update_flagship(workdir, rd.from_arrow(to_tbl(rest)),
                               num_buckets=4)
    again = store.read_store(f"{workdir}/triples_store").to_pandas()
    assert set(map(tuple, again[key].itertuples(index=False))) == \
        set(map(tuple, full[key].itertuples(index=False)))
    assert len(again) == len(full)


def test_incremental_soak_three_batches_resend_and_rebuild(
        ray_session, tiny_corpus, tmp_path):
    """Soak the incremental chain (VERDICT r3 #10): THREE update batches in
    sequence (snapshot waves split per url), a mid-chain re-send, and a
    final fresh=True rebuild — asserting merged-store == cold-run over the
    union of delivered pages at EVERY step. Pins the deterministic
    fingerprint chain under longer histories than the 2-batch test."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from gitprov_ray import checkpoint, schemas, store, synth
    from gitprov_ray.pipelines import flagship as fl

    pages, _, _ = tiny_corpus
    pdf = pages.to_pandas().sort_values(["url", "warc_ts"], kind="mergesort")
    # wave k = each url's k-th snapshot: every batch touches every graph,
    # and version chains grow one link per batch (the worst case for the
    # lag state)
    pdf["wave"] = pdf.groupby("url").cumcount()
    waves = [pdf[pdf.wave == 0], pdf[pdf.wave == 1],
             pdf[pdf.wave >= 2]]
    assert all(len(w) > 0 for w in waves)
    drop = lambda d: d.drop(columns=["wave"]).reset_index(drop=True)
    to_tbl = lambda d: pa.Table.from_pandas(drop(d), schema=schemas.PAGES,
                                            preserve_index=False)
    graphs = sorted({u.split("/")[2] for u in pdf["url"]})
    contributors = synth.contributors_for_sources(graphs).to_pylist()
    key = ["graph", "subj", "pred", "obj"]

    def store_equals_cold_run(workdir, delivered_frames):
        got = store.read_store(f"{workdir}/triples_store").to_pandas()
        import pandas as pd

        all_pages = pa.Table.from_pandas(
            drop(pd.concat(delivered_frames)), schema=schemas.PAGES,
            preserve_index=False)
        full = fl.triples_from_pages(rd.from_arrow(all_pages), contributors,
                                     num_buckets=4).to_pandas()
        assert len(got) == len(full)
        assert set(map(tuple, got[key].itertuples(index=False))) == \
            set(map(tuple, full[key].itertuples(index=False)))

    wd = str(tmp_path / "soak")
    os.makedirs(wd)
    revs = fl.revisions_from_pages(rd.from_arrow(to_tbl(waves[0])))
    checkpoint._write_stage(revs, wd, "revisions", "init")
    tri = fl.triples_from_revisions(checkpoint._read_stage(wd, "revisions"),
                                    contributors, num_buckets=4)
    store.write_store(tri, f"{wd}/triples_store", fingerprint="init")
    store_equals_cold_run(wd, [waves[0]])

    fps = []
    for k in (1, 2):
        res = checkpoint.update_flagship(wd, rd.from_arrow(to_tbl(waves[k])),
                                         num_buckets=4)
        assert res["new_events"] > 0
        store_equals_cold_run(wd, waves[: k + 1])
        with open(checkpoint._manifest_path(wd, "revisions")) as f:
            import json

            fps.append(json.load(f)["fingerprint"])
    assert fps[0] != fps[1]                 # chain advances per batch

    # mid-chain re-send of wave 1: rows dedup away — store unchanged and
    # the revisions checkpoint does not grow (the chain fp still advances
    # deterministically, by design)
    n_before = checkpoint._read_stage(wd, "revisions").count()
    checkpoint.update_flagship(wd, rd.from_arrow(to_tbl(waves[1])),
                               num_buckets=4)
    store_equals_cold_run(wd, waves)
    assert checkpoint._read_stage(wd, "revisions").count() == n_before
    with open(checkpoint._manifest_path(wd, "revisions")) as f:
        import json

        fp_resend = json.load(f)["fingerprint"]
    assert fp_resend.startswith("incremental-")

    # plain run_flagship still refuses the incremental workdir…
    with pytest.raises(ValueError, match="incremental state"):
        checkpoint.run_flagship("/root/testdata/sf0.001", wd, num_buckets=4)
    # …and fresh=True rebuilds the base corpus from scratch
    r = checkpoint.run_flagship("/root/testdata/sf0.001", wd, num_buckets=4,
                                fresh=True)
    assert r["triples"] > 0 and r["resumed"] == []
    assert store.list_graphs(f"{wd}/triples_store")


@pytest.mark.usefixtures("ray_session")
def test_canonicalize_cold_vs_crash_resume(tmp_path):
    """VERDICT r04 #6 twin (sf0.001): the canonicalize=True flagship
    through the checkpoint machinery — a crashed-and-resumed run's store
    equals the cold run's EXACTLY, i.e. the entity-linking rewrite is
    deterministic per graph even when half the store survived the crash
    and the other half is rewritten by the resumed run."""
    import os

    from gitprov_ray import checkpoint, store

    SF = "/root/testdata/sf0.001"
    wd_cold = str(tmp_path / "cold")
    r_cold = checkpoint.run_flagship(SF, wd_cold, num_buckets=8,
                                     canonicalize=True)
    cold = store.read_store(r_cold["store"]).to_pandas()
    assert "|canon=1" in r_cold["fingerprint"]
    # the rewrite actually ran: canonical stores differ from plain ones
    r_plain = checkpoint.run_flagship(SF, str(tmp_path / "plain"),
                                      num_buckets=8)
    plain = store.read_store(r_plain["store"]).to_pandas()
    assert set(cold.subj) != set(plain.subj) or \
        set(cold.obj) != set(plain.obj)

    # crash simulation: drop two graph partitions mid-store, resume
    wd = str(tmp_path / "crash")
    r1 = checkpoint.run_flagship(SF, wd, num_buckets=8, canonicalize=True)
    graphs = store.list_graphs(r1["store"])
    for g in graphs[:2]:
        shutil.rmtree(os.path.join(r1["store"], "gpart=" + g))
    r2 = checkpoint.run_flagship(SF, wd, num_buckets=8, canonicalize=True)
    assert "revisions" in r2["resumed"]
    back = store.read_store(r2["store"]).to_pandas()
    assert set(zip(back.graph, back.subj, back.pred, back.obj)) == \
           set(zip(cold.graph, cold.subj, cold.pred, cold.obj))
    # canonical and plain fingerprints never cross-resume
    r3 = checkpoint.run_flagship(SF, wd, num_buckets=8)
    assert r3["resumed"] == [] or "triples" not in r3["resumed"]
