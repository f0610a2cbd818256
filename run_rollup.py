"""spark-submit entrypoint: run the retention-tier rollup pipeline.

Usage (local sandbox):
    spark-submit --master local[8] run_rollup.py --n-conv 2000 --out /tmp/tiers

On a cluster:
    spark-submit --py-files gmql_spark.zip run_rollup.py \
        --input <transcripts table path> --out <warehouse path>

Analogue of the reference CLI ``GMQL-Cli/.../GMQLExecuteCommand.scala:95``
(script → DAG → materialize); here the "script" is the fixed tier
pipeline and materialization is partitioned parquet per tier.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", default=None, help="parquet path of transcripts (input_hint schema)")
    ap.add_argument("--n-conv", type=int, default=2000, help="synthesize N conversations if no --input")
    ap.add_argument("--out", required=True, help="output dir; one subdir per tier")
    ap.add_argument("--tiers", default="1m,1h,1d")
    ap.add_argument("--json", action="store_true", help="print one JSON summary line")
    args = ap.parse_args(argv)

    # spark-submit provides the session; fall back to local builder for dev
    spark = SparkSession.builder.appName("gmql-spark-rollup").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from gmql_spark.datagen import transcripts_spark
    from gmql_spark.operators.rollup import rollup_all_tiers

    tiers = [t.strip() for t in args.tiers.split(",") if t.strip()]
    t0 = time.time()
    if args.input:
        raw = spark.read.parquet(args.input)
    else:
        raw = transcripts_spark(spark, n_conv=args.n_conv)
    n_turns = raw.count()

    outs = rollup_all_tiers(raw, tiers=tiers)
    stats = {}
    for tier, df in outs.items():
        path = f"{args.out}/rollup_{tier}"
        df.write.mode("overwrite").parquet(path)
        stats[tier] = spark.read.parquet(path).count()
    wall = time.time() - t0

    summary = {
        "turns": n_turns,
        "tiers": stats,
        "wall_s": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
    }
    if args.json:
        print(json.dumps(summary))
    else:
        print(f"rolled up {n_turns} turns -> {stats} in {wall:.1f}s "
              f"({summary['turns_per_sec']} turns/s)")
        spark.read.parquet(f"{args.out}/rollup_1m").orderBy("conv_id", "window_start").show(
            5, truncate=False
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
