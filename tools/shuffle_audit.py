"""Shuffle audit: build every registered query's LAZY Ray Data plan at
sf0.001 and count the all-to-all exchanges (Sort / Aggregate / Repartition /
Join / HashShuffle operators) in the final Dataset's plan string.

This is the static half of the 100-TB scale review: a query whose plan
carries more exchanges than its algorithm needs is a candidate for the
bucketed-combine treatment (CLAUDE.md invariants 3/6). Queries that
return pandas (driver-small results) execute eagerly and are reported
as 'eager' — their shuffle shape is documented in their docstrings.

Usage: python tools/shuffle_audit.py [--sf-dir DIR] [--out PLANS.md]
"""

import argparse
import re
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from gitprov_ray.queries import QUERIES

    rows = []
    for name, fn in sorted(QUERIES.items()):
        t0 = time.time()
        try:
            res = fn(args.sf_dir)
        except Exception as e:                        # pragma: no cover
            rows.append((name, "ERROR", str(e)[:80]))
            continue
        dt = time.time() - t0
        if not hasattr(res, "_plan"):
            rows.append((name, "eager", f"returns {type(res).__name__} "
                         f"(driver-small result), built in {dt:.1f}s"))
            continue
        ops_seen: list[str] = []

        def walk(op):
            ops_seen.append(type(op).__name__)
            for d in op.input_dependencies:
                walk(d)

        walk(res._logical_plan.dag)
        exchanges = [o for o in ops_seen if re.match(
            r"Sort|Aggregate|Repartition|Join|RandomShuffle|Distinct", o)]
        rows.append((name, str(len(exchanges)),
                     "+".join(exchanges) if exchanges else "map-only"))
    out_lines = ["| query | exchanges | plan |", "|---|---|---|"]
    for name, n, detail in rows:
        out_lines.append(f"| {name} | {n} | {detail} |")
    text = "\n".join(out_lines)
    if args.out:
        with open(args.out, "w") as f:
            f.write("# Per-query exchange audit (lazy plans, sf0.001)\n\n"
                    + text + "\n")
    print(text)
    counts = [int(n) for _, n, _ in rows if n.isdigit()]
    eager = sum(1 for _, n, _ in rows if n == "eager")
    err = sum(1 for _, n, _ in rows if n == "ERROR")
    print(f"\nlazy plans: {len(counts)}, eager: {eager}, errors: {err}, "
          f"max exchanges: {max(counts) if counts else 0}",
          file=sys.stderr)
    ray.shutdown()


if __name__ == "__main__":
    main()
