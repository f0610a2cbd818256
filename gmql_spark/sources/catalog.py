"""Table storage layer: Iceberg-shaped partitioned tables.

Target layout (FIXTURES.md §1 / north rule): fact table partitioned by
``bucket(16, conv_id), days(ts)``. When an Iceberg runtime jar is on the
classpath we use the real transforms (``writeTo(...).partitionedBy(
bucket(16, col), days(col))``); this sandbox has no Iceberg jar, so the
fallback materializes the SAME layout as hive-style parquet dirs
(``conv_bucket=<n>/event_date=<d>``) — identical pruning behavior
(partition filters on conv_bucket/event_date prune directories), and the
write path is a drop-in swap.

The reference's analogue: one file per sample via a custom partitioner +
``MultipleTextOutputFormat`` (``StoreTABRD.scala:23-95``) and md5-named
dataset dirs; here partition pruning and schema/metrics come from the
table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS_DEFAULT = 16


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Schema  # noqa: SLF001
        return True
    except Exception:
        return False


def write_transcripts(
    df: DataFrame,
    path: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
    key: str = "conv_id",
    ts: str = "ts",
    mode: str = "overwrite",
    precompute_gaps: bool = False,
    partition_days: bool = True,
) -> None:
    """Write the fact table with bucket(key) × days(ts) partitioning.

    ``conv_bucket = pmod(xxhash64(key), n)`` mirrors Iceberg's bucket
    transform role (hash co-location of each conversation) and matches
    checkpoint.run_pipeline's work partitioning, so resume jobs prune to
    one directory per bucket.

    ``precompute_gaps=True`` materializes the inter-turn ``gap_us``
    derived column at ingest (one window pass, here, once) so every
    downstream rollup/percentile job skips the raw-scale sort shuffle —
    the single most effective plan change for the tier pipeline.
    ``partition_days=False`` skips the date dir level (useful for small
    benchmarks where days() would shatter file sizes).
    """
    if precompute_gaps:
        from gmql_spark.operators.rollup import with_gap_seconds

        df = with_gap_seconds(df, key=key, ts=ts).drop("gap_s")
    out = df.withColumn(
        "conv_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )
    part_cols = ["conv_bucket"]
    if partition_days:
        out = out.withColumn("event_date", F.to_date(F.col(ts)))
        part_cols.append("event_date")
    (
        out.repartition(n_buckets, "conv_bucket")  # one writer wave per bucket
        .write.mode(mode)
        .partitionBy(*part_cols)
        .parquet(path)
    )


def read_transcripts(
    spark: SparkSession, path: str, buckets: list[int] | None = None
) -> DataFrame:
    """Read the fact table; ``buckets`` filter prunes partitions at plan
    time (visible as PartitionFilters in explain())."""
    df = spark.read.parquet(path)
    if buckets is not None:
        df = df.filter(F.col("conv_bucket").isin(buckets))
    return df.drop("conv_bucket", "event_date")  # gap_us (if present) is kept
