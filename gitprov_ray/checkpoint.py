"""Checkpoint-resumable flagship runs (SURVEY.md §4.2 / §7.6).

A run writes each major stage boundary as Parquet under ``workdir`` with a
``_MANIFEST.json`` capturing the input fingerprint and stage config. Resume
= re-running the same function: stages whose manifest validates (same
fingerprint + config, row count matches the files) are skipped and read
back from Parquet; only missing/invalid stages recompute. Writes go through
a staging dir + atomic rename, mirroring the reference's TDB transaction
boundary (StoreService.java:40-43).

Stages:
  1. ``revisions`` — pages parsed to the event table (the expensive html
     pass; small output, ideal checkpoint);
  2. ``triples``  — the final graph, written via store.write_store (one
     sorted deduplicated partition per graph, per-partition manifests).

Determinism contract (tested): a resumed run's triple set is identical to a
cold run's.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.dataset as pads

from . import store as store_mod
from .pipelines import flagship as fl


_CODE_VERSION = "r2"  # bump when stage semantics change → old checkpoints invalid


def _fingerprint(sf_dir: str, repeat: int) -> str:
    """Full-content input fingerprint. The input is read in full anyway, so
    a streaming sha1 over the whole file is cheap relative to the run — and
    unlike a size+head/tail sample it cannot validate a stale checkpoint
    after a same-size middle-of-file edit (the 'resumed run identical to
    cold run' determinism contract)."""
    p = f"{sf_dir}/documents.parquet"
    h = hashlib.sha1()
    with open(p, "rb") as f:
        while chunk := f.read(1 << 22):
            h.update(chunk)
    h.update(f"repeat={repeat}|v={_CODE_VERSION}".encode())
    return h.hexdigest()


def _stage_dir(workdir: str, stage: str) -> str:
    return os.path.join(workdir, f"stage={stage}")


def _manifest_path(workdir: str, stage: str) -> str:
    return os.path.join(_stage_dir(workdir, stage), "_MANIFEST.json")


def _stage_valid(workdir: str, stage: str, fingerprint: str) -> bool:
    mp = _manifest_path(workdir, stage)
    if not os.path.exists(mp):
        return False
    with open(mp) as f:
        m = json.load(f)
    if m.get("fingerprint") != fingerprint:
        return False
    try:
        files = [os.path.join(_stage_dir(workdir, stage), fn)
                 for fn in m["files"]]
        return pads.dataset(files).count_rows() == m["rows"]
    except Exception:
        return False


def _write_stage(ds, workdir: str, stage: str, fingerprint: str) -> None:
    final = _stage_dir(workdir, stage)
    staging = os.path.join(workdir, f".staging-{stage}-{uuid.uuid4().hex[:8]}")
    try:
        ds.write_parquet(staging, compression="zstd")
        files = sorted(f for f in os.listdir(staging) if f.endswith(".parquet"))
        rows = pads.dataset(
            [os.path.join(staging, f) for f in files]).count_rows()
        with open(os.path.join(staging, "_MANIFEST.json"), "w") as f:
            json.dump({"stage": stage, "rows": rows, "files": files,
                       "fingerprint": fingerprint}, f, sort_keys=True)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(staging, final)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _read_stage(workdir: str, stage: str):
    from .util import read_parquet_clean

    with open(_manifest_path(workdir, stage)) as f:
        m = json.load(f)
    return read_parquet_clean([os.path.join(_stage_dir(workdir, stage), fn)
                               for fn in m["files"]])


def _has_incremental_state(workdir: str) -> bool:
    mp = _manifest_path(workdir, "revisions")
    if not os.path.exists(mp):
        return False
    with open(mp) as f:
        return json.load(f).get("fingerprint", "").startswith("incremental-")


def run_flagship(sf_dir: str, workdir: str, num_buckets: int = 32,
                 repeat: int = 1, fresh: bool = False,
                 canonicalize: bool = False) -> dict:
    """Checkpointed flagship run; returns stage metrics incl. which stages
    were resumed from checkpoint. ``canonicalize=True`` runs the agent
    entity-linking rewrite before the store write (the fingerprint
    carries the flag, so canonical and plain stores never cross-resume);
    the rewrite is deterministic, so per-graph store content is
    identical whether a run completed cold or resumed mid-store.

    A workdir that ``update_flagship`` has merged incremental batches into
    is REFUSED (the base-corpus fingerprint can never match, so resuming
    would silently rmtree the merged store and recompute from the base
    corpus only — discarding every merged batch). Pass ``fresh=True`` to
    explicitly discard the incremental state and rebuild from ``sf_dir``.
    """
    os.makedirs(workdir, exist_ok=True)
    if _has_incremental_state(workdir):
        if not fresh:
            raise ValueError(
                f"workdir {workdir!r} carries incremental state (merged "
                "update_flagship batches); run_flagship would discard it. "
                "Continue with update_flagship, or pass fresh=True to "
                "rebuild from the base corpus.")
        shutil.rmtree(_stage_dir(workdir, "revisions"), ignore_errors=True)
        shutil.rmtree(os.path.join(workdir, "triples_store"),
                      ignore_errors=True)
    fp = _fingerprint(sf_dir, repeat) + f"|b={num_buckets}" \
        + ("|canon=1" if canonicalize else "")
    resumed = []

    if _stage_valid(workdir, "revisions", fp):
        revisions = _read_stage(workdir, "revisions")
        resumed.append("revisions")
    else:
        pages = fl.pages_from_documents(sf_dir, repeat=repeat)
        _write_stage(fl.revisions_from_pages(pages), workdir, "revisions", fp)
        revisions = _read_stage(workdir, "revisions")

    store_root = os.path.join(workdir, "triples_store")
    contributors = fl.contributors_for_sf(sf_dir)
    done = set(store_mod.list_graphs(store_root))
    expected = {c["graph"] for c in contributors}
    man_fp_ok = all(
        (store_mod.read_manifest(store_root, g) or {}).get("fingerprint") == fp
        for g in done)
    if done == expected and man_fp_ok and done:
        resumed.append("triples")
        n = sum((store_mod.read_manifest(store_root, g) or {}).get("rows", 0)
                for g in sorted(done))
    else:
        if done and not man_fp_ok:
            shutil.rmtree(store_root, ignore_errors=True)
            done = set()
        triples = fl.triples_from_revisions(
            revisions, contributors, num_buckets=num_buckets, checkpoint=False)
        if canonicalize:
            triples = fl.canonicalize_triples(triples.materialize(),
                                              num_buckets=num_buckets)
        written = store_mod.write_store(triples, store_root,
                                        skip_existing=bool(done),
                                        fingerprint=fp)
        n = sum(written.values()) + sum(
            (store_mod.read_manifest(store_root, g) or {}).get("rows", 0)
            for g in sorted(done))

    metrics = _run_metrics(sf_dir, repeat, revisions, store_root, n)
    result = {"triples": n, "resumed": resumed, "store": store_root,
              "fingerprint": fp, "metrics": metrics}
    with open(os.path.join(workdir, "_METRICS.json"), "w") as f:
        json.dump(result, f, sort_keys=True, default=str)
    return result


def _event_key_array(t: "pa.Table"):
    """Composite event identity (graph, page_key, snapshot_id, event_seq)
    as one string array — the dedup/digest key for revision rows."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(
        t.column("graph"), t.column("page_key"), t.column("snapshot_id"),
        pc.cast(t.column("event_seq"), pa.string()), "\x1f")


def _events_digest(revs_ds) -> str:
    """Order- and partitioning-independent content digest of an event set:
    per-batch uint64 hash-sum of the composite keys (tiny partials merged
    on the driver). Deterministic → the incremental fingerprint chain is
    reproducible, unlike the old random uuid stamp (ADVICE r2)."""
    import pandas as pd

    def part(t: pa.Table) -> pa.Table:
        k = _event_key_array(t).to_numpy(zero_copy_only=False)
        h = 0 if t.num_rows == 0 else int(
            pd.util.hash_array(k.astype(object)).sum())
        return pa.table({"h": pa.array([h & 0x7FFFFFFFFFFFFFFF], pa.int64())})

    import numpy as np

    parts = revs_ds.map_batches(part, batch_format="pyarrow").to_pandas()
    total = int(parts["h"].to_numpy(dtype=np.int64).sum()
                & 0x7FFFFFFFFFFFFFFF)
    return f"{total:016x}"


def _dedup_events(revs_ds, num_buckets: int):
    """Distributed event dedup on the composite key (bucketed shuffle +
    in-bucket first-occurrence keep). Arrow end-to-end — a pandas round
    trip would mangle the ``parents`` list column."""
    import numpy as np
    import pandas as pd

    def add_bucket(t: pa.Table) -> pa.Table:
        k = _event_key_array(t).to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(k.astype(object)) % num_buckets
             ).astype(np.int64)
        return t.append_column("ebucket", pa.array(b))

    def dedup(t: pa.Table) -> pa.Table:
        k = _event_key_array(t).to_numpy(zero_copy_only=False)
        _, idx = np.unique(k.astype(object), return_index=True)
        return t.take(np.sort(idx)).drop_columns(["ebucket"])

    return (revs_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("ebucket")
            .map_groups(dedup, batch_format="pyarrow"))


def update_flagship(workdir: str, new_pages_ds, num_buckets: int = 32) -> dict:
    """Incremental update: merge a NEW batch of pages into an existing
    flagship run without recomputing the world.

    Only the graphs touched by the new batch recompute: their old events
    (from the ``revisions`` stage checkpoint) union the new ones, flow
    through the normal statements→triples pipeline, and replace exactly
    those graph partitions in the store (replace-on-store semantics).
    Version chains stay correct because the lag shuffle sees the affected
    graphs' FULL event history, old and new. Work is proportional to the
    affected graphs, not the corpus — the 100-TB shape where a daily crawl
    batch touches a sliver of hosts.

    Re-sending already-processed pages is a no-op: the affected slice is
    deduplicated on (graph, page_key, snapshot_id, event_seq) before the
    pipeline and before the checkpoint write-back, so the revisions
    checkpoint never grows from re-sends. The new fingerprint is derived
    deterministically (sha1 of the prior fingerprint + an order-independent
    batch content digest) — two runs merging the same batches produce the
    same fingerprint chain. Returns {graphs, new_events, triples_written}.
    """
    from . import synth

    new_revs = fl.revisions_from_pages(new_pages_ds).materialize()
    affected = sorted(set(new_revs.select_columns(["graph"])
                          .to_pandas()["graph"]))
    if not affected:
        return {"graphs": [], "new_events": 0, "triples_written": 0}

    import pyarrow.compute as pc

    aff_arr = pa.array(affected, pa.string())
    old_revs = _read_stage(workdir, "revisions")
    # Arrow filter — a pandas round trip would mangle the parents list col
    old_aff = old_revs.map_batches(
        lambda t: t.filter(pc.is_in(t["graph"], value_set=aff_arr)),
        batch_format="pyarrow")
    # dedup ONLY the affected slice (duplicates can't span into untouched
    # graphs) — keeps update cost proportional to the batch, not the corpus
    combined = _dedup_events(old_aff.union(new_revs),
                             num_buckets).materialize()

    with open(_manifest_path(workdir, "revisions")) as f:
        prior_fp = json.load(f).get("fingerprint", "none")
    digest = _events_digest(new_revs)
    fp = "incremental-" + hashlib.sha1(
        f"{prior_fp}|{digest}".encode()).hexdigest()[:16]

    contributors = synth.contributors_for_sources(affected).to_pylist()
    triples = fl.triples_from_revisions(
        combined, contributors, num_buckets=num_buckets, checkpoint=True)
    store_root = os.path.join(workdir, "triples_store")
    written = store_mod.write_store(triples, store_root, fingerprint=fp)

    # extend the revisions checkpoint so the NEXT update sees this history
    old_rest = old_revs.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t["graph"], value_set=aff_arr))),
        batch_format="pyarrow")
    _write_stage(old_rest.union(combined), workdir, "revisions", fp)

    return {"graphs": affected, "new_events": new_revs.count(),
            "triples_written": sum(written.values())}


def _run_metrics(sf_dir: str, repeat: int, revisions, store_root: str,
                 n_triples: int) -> dict:
    """Per-run pipeline counters (north rule: lineage + METRICS).

    quarantine accounting (M15/M16 policy):
      * pages_quarantined_or_dup = rendered pages that produced no events
        (empty/boilerplate html) or were exact (url, warc_ts) duplicates;
      * modified_without_prior  = 'modified' events with no prior version in
        the corpus (reference would NPE, quirk 4) — each healthy modified
        event yields exactly one prov:used triple, so the difference counts
        the quarantined ones.
    """
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    agg = revisions.map_batches(
        lambda t: pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "n_modified": pa.array(
                [pc.sum(pc.equal(t.column("change_status"), "modified")
                        .cast(pa.int64())).as_py() or 0], pa.int64()),
        }), batch_format="pyarrow").to_pandas().sum()
    n_events = int(agg["n"])
    n_modified = int(agg["n_modified"])
    n_snapshots = len(set(revisions.select_columns(["snapshot_id"])
                          .to_pandas()["snapshot_id"]))
    used_pred = "http://www.w3.org/ns/prov#used"
    n_used = pads.dataset(store_root).count_rows(
        filter=pads.field("pred") == used_pred)
    return {
        "input_documents": n_docs,
        "corpus_repeat": repeat,
        "events": n_events,
        "snapshots": n_snapshots,
        "modified_events": n_modified,
        "used_triples": n_used,
        "modified_without_prior_quarantined": n_modified - n_used,
        "triples": n_triples,
    }
