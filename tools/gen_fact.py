"""Generate + write the synthetic transcript fact table (bucketed layout)
for the scaling benchmark. Prints one JSON line with the row count."""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def spark_gen(spark, n_conv: int, gap_mean_s: float = 20.0):
    """Distributed transcript generator (JVM expressions only): same
    distributions as gmql_spark.datagen (lognormal turn counts, Exp(20s)
    gaps with 5%% long outliers, weighted roles) at arbitrary scale."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    conv = (
        spark.range(n_conv)
        .select(
            F.concat(F.lit("conv"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("conv_id"),
            F.least(
                F.greatest(F.round(F.exp(F.lit(3.0) + F.randn(1))).cast("int"), F.lit(1)),
                F.lit(5000),
            ).alias("n_turns"),
            (
                F.to_timestamp(F.lit("2026-01-01"))
                + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.rand(2) * 30 * 86400)
            ).alias("start_ts"),
        )
    )
    turns = conv.select(
        "conv_id",
        "start_ts",
        F.posexplode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx", "_"),
    ).drop("_")
    r = F.rand(3)
    gap = F.when(F.rand(4) < 0.05, F.rand(5) * 21000 + 600).otherwise(
        F.lit(-float(gap_mean_s)) * F.log(r + 1e-12)
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns = turns.withColumn("gap_s", F.when(F.col("turn_idx") == 0, 0.0).otherwise(gap))
    turns = turns.withColumn(
        "ts", F.col("start_ts") + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.sum("gap_s").over(w))
    )
    role_r = F.rand(6)
    role = (
        F.when(role_r < 0.35, "user")
        .when(role_r < 0.80, "assistant")
        .when(role_r < 0.82, "system")
        .otherwise("tool")
    )
    tools = ["bash", "read_file", "write_file", "search", "browser", "sql",
             "python", "calculator", "http_get", "summarize", "translate", "ocr"]
    tool = F.when(
        (role == "tool") & (F.rand(7) >= 0.05),
        F.element_at(F.array(*[F.lit(t) for t in tools]), (F.rand(8) * 12).cast("int") + 1),
    )
    text = F.concat(F.col("conv_id"), F.lit(":"), F.col("turn_idx").cast("string"), F.lit(":"),
                    F.sha2(F.concat(F.col("conv_id"), F.col("turn_idx").cast("string")), 256))
    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.col("ts").cast("timestamp").alias("ts"),
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-conv", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--precompute-gaps", action="store_true")
    ap.add_argument("--flat-days", action="store_true", help="skip event_date dir level")
    ap.add_argument("--gap-mean-s", type=float, default=20.0,
                    help="mean inter-turn gap; ~5s gives a realistic agent cadence "
                         "(1m tier ~10%% of raw) for scaling benchmarks")
    ap.add_argument(
        "--engine",
        choices=["pandas", "spark"],
        default="pandas",
        help="pandas = the exact FIXTURES.md generator (correctness); "
        "spark = distributed JVM-side generator for big bench scales "
        "(same shape/distributions, short texts — rollups never read text)",
    )
    args = ap.parse_args(argv)

    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from gmql_spark.sources.catalog import write_transcripts

    if args.engine == "pandas":
        from gmql_spark.datagen import transcripts_spark

        df = transcripts_spark(spark, n_conv=args.n_conv)
    else:
        df = spark_gen(spark, args.n_conv, gap_mean_s=args.gap_mean_s)
    write_transcripts(
        df, args.out, n_buckets=args.buckets,
        precompute_gaps=args.precompute_gaps,
        partition_days=not args.flat_days,
    )
    n = spark.read.parquet(args.out).count()
    with open(f"{args.out}/_meta.json", "w") as f:
        json.dump({"turns": n, "n_conv": args.n_conv}, f)
    print(json.dumps({"turns": n}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
