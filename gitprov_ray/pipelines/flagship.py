"""The flagship KG-construction pipeline (SURVEY.md §3.1 engine equivalent).

    read pages → map_batches(parse html → revision events)
               → map_batches(EmitStateless, broadcast agents)   [stateless stmts]
               → groupby(bucket(graph,page_key)).map_groups     [version lag]
               → union(agent stmts)
               → flatten to triples → bucketed dedup → sort     [final graph]

Everything streams; the only materialized side input is the tiny
contributors table (broadcast via ``ray.put``). Callers own the Ray session
(driver contract) — nothing here calls ``ray.init``.
"""

from __future__ import annotations

import ray.data as rd

from ..stages import emit, pages as pages_stage, triples as triples_stage, versions
from .. import synth


def revisions_from_pages(pages_ds: "rd.Dataset") -> "rd.Dataset":
    # batch_size=None → one batch per block; the read stage already splits
    # into 2×CPU blocks, and explicit batch_size on a fused chain would
    # re-bundle by INPUT rows (pre-expansion), starving the cluster
    return pages_ds.map_batches(pages_stage.page_events_batch,
                                batch_format="pyarrow")


def statements_from_revisions(revisions_ds: "rd.Dataset",
                              contributor_rows: list[dict],
                              num_buckets: int = 64) -> "rd.Dataset":
    # Broadcast: the tiny agents index is serialized ONCE into the object
    # store by Ray as a constructor arg and fetched once per actor in
    # __init__ — never re-shipped per batch.
    agents_idx = emit.agents_index(contributor_rows)
    # stateless task-pool emit: the small agents index broadcasts via the
    # serialized-once closure; no actor-pool spawn latency (the actor-pool
    # variant, emit.EmitStateless, is for genuinely expensive per-worker
    # state — model weights, linkage indexes)
    stateless = revisions_ds.map_batches(
        emit.make_emitter(agents_idx), batch_format="pyarrow")
    versioned = versions.version_statements(revisions_ds, num_buckets=num_buckets)
    agent_stmts = rd.from_arrow(emit.emit_agents_table(contributor_rows))
    return stateless.union(versioned).union(agent_stmts)


def triples_from_revisions(revisions_ds, contributor_rows,
                           num_buckets: int = 64, sort: bool = False,
                           checkpoint: bool = True):
    # The revisions dataset feeds BOTH the stateless-emit branch and the
    # version-lag branch; Ray Data re-executes shared lineage per consumer,
    # so materialize the (narrow) event table once. This is also the
    # natural checkpoint boundary (§4.2): events are small relative to the
    # html they were parsed from.
    if checkpoint:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        # materialize compacts to few large blocks; re-split so the two
        # consumer branches fan out across all cores
        revisions_ds = revisions_ds.materialize().repartition(max(16, 2 * ncpu))
    stmts = statements_from_revisions(revisions_ds, contributor_rows,
                                      num_buckets=num_buckets)
    # compact-id exchange: local names + predicate codes through the dedup
    # shuffle, URIs expanded post-dedup (~45% fewer shuffle bytes; proven
    # row-identical to the full-width exchange by test_compact_exchange)
    return triples_stage.statements_to_triples_compact(
        stmts, num_buckets=num_buckets, sort=sort)


def triples_from_pages(pages_ds, contributor_rows,
                       num_buckets: int = 64, sort: bool = False,
                       checkpoint: bool = True):
    return triples_from_revisions(revisions_from_pages(pages_ds),
                                  contributor_rows, num_buckets=num_buckets,
                                  sort=sort, checkpoint=checkpoint)


def flagship_from_pages_parquet(pages_path: str, contributor_rows: list[dict],
                                num_buckets: int = 64, sort: bool = False,
                                checkpoint: bool = True,
                                canonicalize: bool = False):
    """Run the flagship over a REAL pages table — a parquet of the
    BASELINE.json input_hint shape (url, warc_ts, html, text, lang), e.g.
    an actual crawl dump. Columns are pruned at the read (text is never
    needed; the extractor re-derives it from html in the same pass that
    parses the revision markers)."""
    from ..util import tune_context

    tune_context()
    from ..util import read_parquet_clean

    low = str(pages_path).lower()
    if low.endswith((".warc", ".warc.gz", ".wet", ".wet.gz")):
        from ..sources import read_warc

        pages_ds = read_warc(pages_path).map_batches(
            lambda t: t.select(["url", "warc_ts", "html"]),
            batch_format="pyarrow")
    elif low.endswith((".xml", ".xml.gz")):
        # dump-style XML pages (<page><url/><warc_ts/><html/></page>) —
        # the Wikipedia-dump ingestion edge; XML carries strings, so the
        # timestamp parses and html re-encodes to bytes here
        import pyarrow as pa

        from ..sources import read_table

        def to_pages(t: "pa.Table") -> "pa.Table":
            import pandas as pd

            ts = pd.to_datetime(t.column("warc_ts").to_pylist(),
                                utc=True).tz_localize(None)
            return pa.table({
                "url": t.column("url").cast(pa.string()),
                "warc_ts": pa.array(ts.astype("datetime64[us]"),
                                    pa.timestamp("us")),
                "html": pa.array([(s or "").encode("utf-8")
                                  for s in t.column("html").to_pylist()],
                                 pa.binary())})

        pages_ds = read_table(pages_path, fmt="xml",
                              record_tag="page").map_batches(
            to_pages, batch_format="pyarrow")
    else:
        pages_ds = read_parquet_clean(pages_path,
                                      columns=["url", "warc_ts", "html"])
    tri = triples_from_pages(pages_ds, contributor_rows,
                             num_buckets=num_buckets, sort=sort,
                             checkpoint=checkpoint)
    return _maybe_canonicalize(tri, canonicalize, sort, num_buckets)


def _maybe_canonicalize(tri, canonicalize: bool, sort: bool, num_buckets: int):
    if not canonicalize:
        return tri
    tri = canonicalize_triples(tri.materialize(), num_buckets=num_buckets)
    return triples_stage.sorted_triples(tri) if sort else tri


def pages_from_documents(sf_dir: str, repeat: int = 1) -> "rd.Dataset":
    """documents.parquet → deterministic synthetic pages corpus (in-engine
    rendering; no external data). Column-pruned at the read."""
    from ..util import tune_context

    tune_context()
    from ..util import read_parquet_clean

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "lang", "source"])
    # the documents file is ONE row group → Ray reads it as 1-2 blocks,
    # and the (repeat×) html render + event parse downstream would run
    # near-serial regardless of cluster size. Re-split the (tiny) doc
    # rows BEFORE the expanding render so the heavy stages fan out —
    # measured: the 16-CPU scaling leg spent ~10 s in a 2-task render.
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    docs = docs.repartition(max(16, 2 * ncpu))
    return docs.map_batches(
        lambda b: pages_stage.render_pages_from_documents_batch(b, repeat),
        batch_format="pyarrow")


def contributors_for_sf(sf_dir: str) -> list[dict]:
    """Deterministic contributors side table for the documents-derived
    corpus. Distinct sources come from a DISTRIBUTED per-batch-dedup +
    hash-aggregate (`ops.distinct_keys`) — only the tiny distinct set ever
    reaches the driver, never the full source column (VERDICT r2 #6). A
    streaming per-batch scanner covers the no-Ray-session case (oracle
    replays in plain pytest)."""
    import os

    import ray

    # size-aware: below the threshold a driver-side STREAMING pyarrow
    # scan (per-batch unique, never the full column in memory) beats
    # spinning Ray aggregate actors for a distinct over a tiny file —
    # measured 10 s of actor startup on a loaded host for 500 rows. The
    # distributed path stays the default the moment the file is big.
    path = f"{sf_dir}/documents.parquet"
    small = os.path.getsize(path) < (256 << 20)
    if ray.is_initialized() and not small:
        from ..ops import distinct_keys
        from ..util import tune_context

        tune_context()
        from ..util import read_parquet_clean

        docs = read_parquet_clean(path, columns=["source"])
        srcs = distinct_keys(docs, "source").to_pandas()["source"]
    else:
        import pyarrow.dataset as pads

        seen: set[str] = set()
        scan = pads.dataset(path)
        for b in scan.to_batches(columns=["source"]):
            seen.update(b.column("source").unique().to_pylist())
        srcs = sorted(seen)
    graphs = sorted(f"{s}.example" for s in srcs)
    return synth.contributors_for_sources(graphs).to_pylist()


def canonicalize_triples(triples_ds, threshold: float = 0.7,
                         num_buckets: int = 64):
    """Opt-in entity-linking stage: cluster near-duplicate agent nodes
    (distributed MinHash+LSH + label propagation,
    linking.canonical_agent_map_ds), rewrite subj/obj to the canonical
    URIs, and re-dedup (rewrites can collide rows).

    The mapping never leaves the cluster: the rewrite is two bucketed
    left_outer joins on subj/obj (`linking.rewrite_canonical_ds`) — at web
    scale the near-dup agent slice is millions of URIs, too big for the
    old driver-collected dict broadcast (kept as
    `linking.rewrite_canonical` for explicitly-small maps)."""
    from .. import linking

    mapping_ds = linking.canonical_agent_map_ds(
        triples_ds, threshold=threshold).materialize()
    if mapping_ds.count() == 0:
        return triples_ds
    rewritten = linking.rewrite_canonical_ds(triples_ds, mapping_ds)
    return triples_stage.dedup_triples(rewritten, num_buckets=num_buckets)


def flagship(sf_dir: str, num_buckets: int = 64, sort: bool = False,
             repeat: int = 1, checkpoint: bool = True,
             canonicalize: bool = False):
    """documents-derived pages → final sorted deduped triples Dataset.

    ``checkpoint=False`` streams the whole DAG with no materialize barrier
    (the two revision consumers re-execute the parse; it parallelizes and
    avoids a pipeline-wide stall — the right trade when not resuming).
    ``canonicalize=True`` adds the opt-in agent entity-linking stage
    (cluster + rewrite + re-dedup)."""
    pages_ds = pages_from_documents(sf_dir, repeat=repeat)
    contributors = contributors_for_sf(sf_dir)
    tri = triples_from_pages(pages_ds, contributors,
                              num_buckets=num_buckets, sort=sort,
                              checkpoint=checkpoint)
    return _maybe_canonicalize(tri, canonicalize, sort, num_buckets)
