"""Command-line surface mapping the reference's REST endpoints to the
engine (a user of git-prov's controllers runs the same operations here):

  provenance  ProvController    (ProvenanceService.java:116-254): pages
              parquet → PROV graph, any registered output format
  store-put   StoreController POST (StoreService.java:28-44)
  store-get   StoreController GET  (StoreService.java:47-59)
  catalog     StoreController list (StoreService.java:61-80)
  sparql      SparqlController     (SparqlService.java:16-31): SPARQL
              SELECT/ASK/CONSTRUCT/DESCRIBE text over a store,
              CSV/TSV/JSON results (ASK returns the SPARQL JSON boolean)
  serialize   format re-serializer (JenaUtils.java:18-41)

The CLI owns the Ray session (library code never calls ray.init — the
driver contract); every command works on parquet paths, so pipelines
compose through the filesystem exactly like the reference's store.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _emit(text: str | bytes, out: str | None) -> None:
    binary = isinstance(text, bytes)       # png/jpeg diagram rasters
    if out:
        with open(out, "wb" if binary else "w") as f:
            f.write(text)
    elif binary:
        sys.stdout.buffer.write(text)
    else:
        sys.stdout.write(text)


def cmd_provenance(args) -> int:
    from .pipelines import flagship
    from . import serializers

    _ray_session(args.num_cpus)
    if args.contributors_parquet:
        import pyarrow.parquet as pq

        contributors = pq.read_table(args.contributors_parquet).to_pylist()
    elif args.contributors_sf:
        contributors = flagship.contributors_for_sf(args.contributors_sf)
    else:
        contributors = []
    tri = flagship.flagship_from_pages_parquet(
        args.pages, contributors, num_buckets=args.buckets,
        canonicalize=args.canonicalize)
    if args.store:
        from . import store as store_mod

        written = store_mod.write_store(tri, args.store)
        print(json.dumps({"graphs": written}, sort_keys=True))
        return 0
    df = tri.to_pandas()
    _emit(serializers.serialize(df, args.format), args.out)
    return 0


def cmd_store_put(args) -> int:
    import ray.data as rd

    from . import store as store_mod

    _ray_session(args.num_cpus)
    from .util import read_parquet_clean

    ds = read_parquet_clean(args.triples)
    written = store_mod.write_store(ds, args.root)
    print(json.dumps({"graphs": written}, sort_keys=True))
    return 0


def cmd_store_get(args) -> int:
    from . import serializers, store as store_mod

    _ray_session(args.num_cpus)
    df = store_mod.read_store(args.root, args.graph).to_pandas()
    _emit(serializers.serialize(df, args.format), args.out)
    return 0


def cmd_catalog(args) -> int:
    from . import store as store_mod

    print(json.dumps({"repositories": [
        {"owner": o, "name": n} for o, n in store_mod.store_catalog(args.root)
    ]}, sort_keys=True))
    return 0


def cmd_sparql(args) -> int:
    from . import serializers, sparql_lite, store as store_mod

    _ray_session(args.num_cpus)
    ds = store_mod.read_store(args.root, args.graph)
    if getattr(args, "driver", False):
        # readable oracle twin: driver-side evaluation (opt-in)
        res = sparql_lite.query_text(ds, args.query)
    else:
        # DEFAULT = the scale path for all four query forms: bindings
        # never concentrate on the driver; only the (LIMIT/aggregate-
        # bounded) result materializes for serialization
        res = sparql_lite.query_text_distributed(ds, args.query)
        if not isinstance(res, bool):
            res = res.to_pandas()
    if isinstance(res, bool):          # ASK → SPARQL JSON boolean result
        _emit(json.dumps({"head": {}, "boolean": res}), args.out)
        return 0
    fmt = {"csv": serializers.result_csv, "tsv": serializers.result_tsv,
           "json": serializers.result_json, "text": serializers.result_text,
           "xml": serializers.result_xml}[args.results]
    _emit(fmt(res), args.out)
    return 0


def cmd_sparql_update(args) -> int:
    from . import sparql_lite

    _ray_session(args.num_cpus)
    counts = sparql_lite.update_store(args.root, args.update,
                                      graph=args.graph)
    _emit(json.dumps(counts, sort_keys=True), getattr(args, "out", None))
    return 0


def cmd_serialize(args) -> int:
    import pyarrow.parquet as pq

    from . import serializers

    df = pq.read_table(args.triples).to_pandas()
    _emit(serializers.serialize(df, args.format), args.out)
    return 0


def cmd_run(args) -> int:
    from . import checkpoint

    _ray_session(args.num_cpus)
    res = checkpoint.run_flagship(args.sf_dir, args.workdir,
                                  num_buckets=args.buckets,
                                  repeat=args.repeat)
    print(json.dumps(res, sort_keys=True, default=str))
    return 0


def cmd_update(args) -> int:
    import ray.data as rd

    from . import checkpoint

    _ray_session(args.num_cpus)
    from .util import read_parquet_clean

    pages = read_parquet_clean(args.pages)
    res = checkpoint.update_flagship(args.workdir, pages,
                                     num_buckets=args.buckets)
    print(json.dumps(res, sort_keys=True))
    return 0


def cmd_curate(args) -> int:
    from .pipelines.curation import curate_documents_full
    from .util import read_parquet_clean

    _ray_session(args.num_cpus)
    docs = read_parquet_clean(args.documents)
    out = curate_documents_full(docs, lang=args.lang,
                                min_tokens=args.min_tokens,
                                max_dup_line_milli=args.max_dup_line_milli)
    out.write_parquet(args.out, compression="zstd")
    print(json.dumps({"out": args.out}))
    return 0


def cmd_probe(args) -> int:
    from .multimodal import probe_pipeline
    from .util import read_parquet_clean

    _ray_session(args.num_cpus)
    media = read_parquet_clean(args.media)
    probe_pipeline(media).write_parquet(args.out, compression="zstd")
    print(json.dumps({"out": args.out}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gitprov_ray", description=__doc__)
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("provenance", help="pages parquet → PROV graph")
    pp.add_argument("pages", help="pages parquet (url, warc_ts, html, ...)")
    pp.add_argument("--contributors-sf",
                    help="sf dir for the deterministic contributors table")
    pp.add_argument("--contributors-parquet",
                    help="contributors side table (CONTRIBUTORS schema)")
    pp.add_argument("--format", default="turtle")
    pp.add_argument("--buckets", type=int, default=64)
    pp.add_argument("--canonicalize", action="store_true")
    pp.add_argument("--store", help="write into this store root instead")
    pp.add_argument("--out")
    pp.set_defaults(fn=cmd_provenance)

    sp = sub.add_parser("store-put", help="triples parquet → store")
    sp.add_argument("root")
    sp.add_argument("triples")
    sp.set_defaults(fn=cmd_store_put)

    sg = sub.add_parser("store-get", help="store → serialized graph")
    sg.add_argument("root")
    sg.add_argument("--graph")
    sg.add_argument("--format", default="turtle")
    sg.add_argument("--out")
    sg.set_defaults(fn=cmd_store_get)

    sc = sub.add_parser("catalog", help="list stored repositories")
    sc.add_argument("root")
    sc.set_defaults(fn=cmd_catalog)

    sq = sub.add_parser("sparql", help="SPARQL SELECT/ASK/CONSTRUCT/DESCRIBE over a store")
    sq.add_argument("root")
    sq.add_argument("query")
    sq.add_argument("--graph")
    sq.add_argument("--results", default="json",
                    choices=["csv", "tsv", "json", "text", "xml"])
    sq.add_argument("--distributed", action="store_true",
                    help="(default since round 4; kept for compatibility)")
    sq.add_argument("--driver", action="store_true",
                    help="evaluate on the driver-side readable twin "
                         "instead of the Dataset scale path")
    sq.add_argument("--out")
    sq.set_defaults(fn=cmd_sparql)

    su = sub.add_parser("sparql-update",
                        help="SPARQL 1.1 Update against a store "
                             "(INSERT/DELETE DATA, DELETE/INSERT WHERE, "
                             "CLEAR GRAPH)")
    su.add_argument("root")
    su.add_argument("update")
    su.add_argument("--graph", default=None)
    su.add_argument("--out", default=None)
    su.add_argument("--num-cpus", type=int, default=None)
    su.set_defaults(fn=cmd_sparql_update)

    rn = sub.add_parser("run", help="checkpointed flagship run over an sf dir")
    rn.add_argument("sf_dir")
    rn.add_argument("workdir")
    rn.add_argument("--buckets", type=int, default=32)
    rn.add_argument("--repeat", type=int, default=1)
    rn.set_defaults(fn=cmd_run)

    up = sub.add_parser("update",
                        help="incremental update: merge a new pages batch")
    up.add_argument("workdir")
    up.add_argument("pages")
    up.add_argument("--buckets", type=int, default=32)
    up.set_defaults(fn=cmd_update)

    sz = sub.add_parser("serialize", help="re-serialize a triples parquet")
    sz.add_argument("triples")
    sz.add_argument("--format", default="ntriples")
    sz.add_argument("--out")
    sz.set_defaults(fn=cmd_serialize)

    cu = sub.add_parser("curate", help="documents parquet → curated "
                        "parquet (tokens/Gopher/repetition/PII + dedup)")
    cu.add_argument("documents")
    cu.add_argument("out")
    cu.add_argument("--lang", default="en")
    cu.add_argument("--min-tokens", type=int, default=10)
    cu.add_argument("--max-dup-line-milli", type=int, default=300)
    cu.set_defaults(fn=cmd_curate)

    pb = sub.add_parser("probe", help="media parquet (media_id, payload)"
                        " → typed metadata parquet")
    pb.add_argument("media")
    pb.add_argument("out")
    pb.set_defaults(fn=cmd_probe)

    sqc = sub.add_parser("sql", help="SELECT subset over parquet tables "
                         "(compiled to Ray Dataset pipelines, sqlfront)")
    sqc.add_argument("query")
    sqc.add_argument("--table", action="append", default=[],
                     metavar="NAME=PATH",
                     help="table binding, repeatable; or use --dir")
    sqc.add_argument("--dir", default=None,
                     help="directory of NAME.parquet files to bind")
    sqc.set_defaults(fn=cmd_sql)
    return p


def cmd_sql(args) -> int:
    import glob
    import os

    from . import sqlfront

    tables = {}
    if args.dir:
        for path in glob.glob(os.path.join(args.dir, "*.parquet")):
            tables[os.path.splitext(os.path.basename(path))[0]] = path
    for spec in args.table:
        name, _, path = spec.partition("=")
        if not path:
            print(f"--table needs NAME=PATH, got {spec!r}",
                  file=sys.stderr)
            return 2
        tables[name] = path
    out = sqlfront.sql_query(args.query, tables)
    print(out.to_csv(index=False), end="")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
