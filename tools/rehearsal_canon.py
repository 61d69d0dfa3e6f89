"""Full-scale rehearsal gate (VERDICT r04 #6): flagship at sf0.1 x
repeat, WITH the canonicalize entity-linking stage, through the
checkpoint machinery — once cold, once with a REAL mid-run SIGKILL and
resume — then assert the two stores are set-identical via DuckDB.

Usage: python tools/rehearsal_canon.py [--sf-dir D] [--repeat 30]
                                       [--kill-frac 0.45] [--cpus 32]
Prints one JSON line with timings, resumed stages and the store diff
counts (must be 0/0). Exit code non-zero on any mismatch.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

_RUNNER = r"""
import sys, json
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from gitprov_ray import checkpoint
r = checkpoint.run_flagship({sf!r}, {wd!r}, num_buckets={buckets},
                            repeat={repeat}, canonicalize=True)
print(json.dumps({{"triples": r["triples"], "resumed": r["resumed"]}}))
ray.shutdown()
"""


def run_once(repo, sf, wd, cpus, repeat, buckets, kill_after=None):
    code = _RUNNER.format(repo=repo, sf=sf, wd=wd, cpus=cpus,
                          repeat=repeat, buckets=buckets)
    t0 = time.time()
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True)
    if kill_after is not None:
        try:
            proc.wait(timeout=kill_after)
            out = proc.stdout.read()
            return {"killed": False, "sec": time.time() - t0, "out": out}
        except subprocess.TimeoutExpired:
            # SIGKILL the whole process group's main — Ray workers die
            # with the driver's session teardown on next init
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            return {"killed": True, "sec": time.time() - t0, "out": ""}
    out, _ = proc.communicate()
    if proc.returncode != 0:
        raise RuntimeError(f"run failed rc={proc.returncode}")
    last = out.strip().splitlines()[-1]
    return {"killed": False, "sec": round(time.time() - t0, 1),
            **json.loads(last)}


def compare_stores(a: str, b: str) -> tuple[int, int]:
    import duckdb

    con = duckdb.connect()
    qa = f"SELECT graph, subj, pred, obj FROM read_parquet('{a}/*/*.parquet')"
    qb = f"SELECT graph, subj, pred, obj FROM read_parquet('{b}/*/*.parquet')"
    d1 = con.sql(f"SELECT COUNT(*) FROM (({qa}) EXCEPT ({qb}))").fetchone()[0]
    d2 = con.sql(f"SELECT COUNT(*) FROM (({qb}) EXCEPT ({qa}))").fetchone()[0]
    return int(d1), int(d2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=30)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--kill-frac", type=float, default=0.45)
    ap.add_argument("--work", default="/tmp/rehearsal_canon")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import shutil

    shutil.rmtree(args.work, ignore_errors=True)
    wd_cold = os.path.join(args.work, "cold")
    wd_kill = os.path.join(args.work, "kill")

    cold = run_once(repo, args.sf_dir, wd_cold, args.cpus, args.repeat,
                    args.buckets)
    kill_at = max(10.0, cold["sec"] * args.kill_frac)
    k1 = run_once(repo, args.sf_dir, wd_kill, args.cpus, args.repeat,
                  args.buckets, kill_after=kill_at)
    k2 = run_once(repo, args.sf_dir, wd_kill, args.cpus, args.repeat,
                  args.buckets)
    d1, d2 = compare_stores(os.path.join(wd_cold, "triples_store"),
                            os.path.join(wd_kill, "triples_store"))
    res = {"metric": "canon_rehearsal", "sf": args.sf_dir,
           "repeat": args.repeat, "cold_sec": cold["sec"],
           "cold_triples": cold["triples"], "kill_after_sec": round(
               kill_at, 1), "was_killed_midrun": k1["killed"],
           "resume_sec": k2["sec"], "resume_triples": k2["triples"],
           "resumed_stages": k2["resumed"],
           "store_diff": [d1, d2]}
    print(json.dumps(res))
    if d1 or d2 or cold["triples"] != k2["triples"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
