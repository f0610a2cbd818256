"""Worker for the N-vs-4N scaling benchmark: read the fact table, run the
full tier rollup (1m/1h/1d) to a noop sink, print one JSON line.

Run via spark-submit so --master local[k] controls parallelism:
    spark-submit --master local[8] tools/scale_worker.py --input /tmp/fact

Scaling-relevant choices (the same ones a cluster deployment makes):
- identical shuffle partitioning at both cluster sizes (tasks are the
  unit of work; more cores = more concurrent tasks, not different tasks)
- the three tier sinks are submitted from concurrent driver threads so
  driver-side serial costs (analysis, AQE replanning, codegen compile)
  overlap with execution instead of serializing between jobs
- known category domains -> pure codegen aggregates
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import SparkSession


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--turns", type=int, default=0, help="known row count (skips the count job)")
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    ap.add_argument("--no-aqe", action="store_true")
    ap.add_argument("--serial", action="store_true", help="submit tier jobs sequentially")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    if args.no_aqe:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    cores = spark.sparkContext.defaultParallelism

    from gmql_spark.datagen import ROLES, TOOL_NAMES
    from gmql_spark.operators.rollup import rollup_all_tiers
    from gmql_spark.sources.catalog import read_transcripts

    # warm-up outside the measured window: executor registration + JIT
    # (a real cluster is already up when a job lands on it); the input
    # data itself is NOT touched before t0
    spark.range(1_000_000).repartition(cores).count()

    t0 = time.perf_counter()
    raw = read_transcripts(spark, args.input)
    tiers = rollup_all_tiers(
        raw,
        role_values=list(ROLES),
        tool_values=list(TOOL_NAMES),
        cache_gaps=True,  # repeated zstd scans cost more than the cache
        persist_tiers=True,
    )

    phases = {}

    def sink(df, name=None):
        p0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        if name:
            phases[name] = round(time.perf_counter() - p0, 2)

    if args.serial:
        for t_name, df in tiers.items():
            sink(df, t_name)
    else:
        # 1m first (materializes the shared gap cache exactly once),
        # then the higher tiers concurrently
        sink(tiers["1m"], "1m")
        rest = [(t, df) for t, df in tiers.items() if t != "1m"]
        with ThreadPoolExecutor(max_workers=max(len(rest), 1)) as ex:
            list(ex.map(lambda td: sink(td[1], td[0]), rest))
    wall = time.perf_counter() - t0
    n_turns = args.turns or raw.count()

    print(json.dumps({
        "cores": cores,
        "turns": n_turns,
        "wall_s": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
        "phases": phases,
        "shuffle_partitions": args.shuffle_partitions,
        "aqe": not args.no_aqe,
        "concurrent_sinks": not args.serial,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
