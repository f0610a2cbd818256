"""Per-query isolation bench (guide §1.1/§1.4): times a subset of the
declared queries with the same methodology as the frozen bench.py
(full materialization via .count(), interleaved reps, medians), plus an
optional noop-sink mode that forces every column. bench.py itself is
FROZEN for driver measurement; every extra number this prints lives in
BENCH/r08/ and OPTIMIZATION_r08.md only.

Usage: python bench_extra.py [--sf DIR] [--reps N] [--noop] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
os.environ["PYTHONPATH"] = _HERE + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="noop sink instead of count()")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from gmql_spark.session import get_spark

    spark = get_spark(cores=os.environ.get("SPARK_GRAFT_CPUS", "32"),
                      app_name="gmql-bench-extra")
    qs = entrymod.queries()
    spark.read.parquet(f"{args.sf}/events.parquet").count()  # warm footer cache

    reps: dict[str, list[float]] = {}
    for rep in range(args.reps):
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            reps.setdefault(name, []).append(dt)
            print(f"# [{rep}] {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
    out = {
        "sf": args.sf,
        "mode": "noop" if args.noop else "count",
        "loadavg": list(os.getloadavg()),
        "medians": {k: round(statistics.median(v), 3) for k, v in reps.items()},
        "reps": {k: [round(x, 3) for x in v] for k, v in reps.items()},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
