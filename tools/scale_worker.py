"""Worker for the N-vs-4N scaling benchmark: read the fact table, run the
full tier rollup (1m/1h/1d) to a noop sink, print one JSON line.

Run via spark-submit so --master local[k] controls parallelism:
    spark-submit --master local[8] tools/scale_worker.py --input /tmp/fact
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--turns", type=int, default=0, help="known row count (skips the count job)")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(cores * 2))

    from gmql_spark.operators.rollup import rollup_all_tiers
    from gmql_spark.sources.catalog import read_transcripts

    from gmql_spark.datagen import ROLES, TOOL_NAMES

    t0 = time.perf_counter()
    raw = read_transcripts(spark, args.input)
    tiers = rollup_all_tiers(
        raw,
        role_values=list(ROLES),
        tool_values=list(TOOL_NAMES),
        cache_gaps=True,
    )
    for _t, df in tiers.items():
        df.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    n_turns = args.turns or raw.count()

    print(json.dumps({
        "cores": cores,
        "turns": n_turns,
        "wall_s": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
