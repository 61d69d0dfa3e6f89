"""Driver-style correctness simulation (the CORRECTNESS_r{N}.json gate).

Runs every ``__ray_entry__.queries()`` entry over ``--sf-dir`` and compares
against its ``oracle_sql()`` twin through DuckDB on the same parquet files,
with the driver's semantics approximated conservatively:

  * row count must match;
  * schema = column-name set must match (driver sorts columns by name);
  * value hash: columns sorted by name, rows sorted by every column,
    then an EXACT dtype-strict frame compare (stricter than the driver's
    stringified hash — if this passes, the driver's hash passes).

Queries with no oracle twin are run rows-only (must not raise, row count
recorded), mirroring the driver's weaker check.

Usage:  python tools/driver_sim.py [--sf-dir /root/testdata/sf0.01]
                                   [--num-cpus 32] [--only q1,q2,...]
Exit code is non-zero if any query fails. CLAUDE.md: run one at sf0.01 /
32 CPUs before shipping a round — partition-count- and dtype-dependent
failures do not reproduce at pytest's sf0.001 / 4-CPU scale.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(df):
    """Driver-style canonical frame: columns sorted by name, rows sorted
    by every column, fresh index."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _compare(ray_df, ora_df):
    out = {"rows_match": len(ray_df) == len(ora_df),
           "schema_match": sorted(ray_df.columns) == sorted(ora_df.columns),
           "hash_match": False,
           "spark_rows": len(ray_df), "oracle_rows": len(ora_df),
           "err": None}
    if out["rows_match"] and out["schema_match"]:
        a, b = _canon(ray_df), _canon(ora_df)
        try:
            import pandas.testing as pdt

            pdt.assert_frame_equal(a, b, check_exact=True)
            out["hash_match"] = True
        except AssertionError as e:
            out["err"] = "value_mismatch: " + str(e).split("\n")[0]
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of query names")
    ap.add_argument("--out", default=None, help="write JSON results here")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb
    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results, failures = {}, []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = _to_pandas(fn(args.sf_dir))
        except Exception:
            results[name] = {"err": "query_raised:\n" + traceback.format_exc()}
            failures.append(name)
            print(f"FAIL  {name}: raised", flush=True)
            continue
        if name in osql:
            ora_df = con.execute(osql[name]).fetchdf()
            r = _compare(ray_df, ora_df)
            ok = r["rows_match"] and r["schema_match"] and r["hash_match"]
        else:
            r = {"rows_match": None, "schema_match": None,
                 "hash_match": None, "spark_rows": len(ray_df),
                 "oracle_rows": None, "err": "no_oracle"}
            ok = True
        r["sec"] = round(time.time() - t0, 2)
        results[name] = r
        if not ok:
            failures.append(name)
        print(("ok   " if ok else "FAIL ") +
              f"{name}  rows={r['spark_rows']}  {r['sec']}s" +
              ("" if ok else f"  {json.dumps({k: r[k] for k in ('rows_match','schema_match','hash_match','err')})}"),
              flush=True)

    n_oracle = sum(1 for r in results.values() if r.get("oracle_rows") is not None)
    summary = {"queries": len(results), "oracle_twins": n_oracle,
               "failures": failures}
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
