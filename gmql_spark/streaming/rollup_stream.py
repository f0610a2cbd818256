"""Structured Streaming variant of the tier rollup.

The reference has no streaming at all (spark-streaming is a declared but
unused dependency — GMQL-Spark/pom.xml; no streaming operator exists).
This module gives the engine an incremental-ingest path: the same
tumbling-window aggregate as operators.rollup, expressed over
``readStream`` with an event-time watermark for late turns.

Semantics differences vs batch (documented, by construction):
- only mergeable aggregates (counts, histogram maps via the count_if
  fast path, min/max, integer-µs sums are not available since lag()
  needs ordered history; latency stats are a batch concern);
- late rows beyond the watermark are dropped (batch reprocessing of the
  affected partitions — checkpoint.run_pipeline — is the repair path,
  the classic lambda split).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmql_spark.functions.aggregates import counts_map
from gmql_spark.operators.rollup import TIER_DURATION


def stream_rollup(
    stream: DataFrame,
    tier: str = "1m",
    key: str = "conv_id",
    ts: str = "ts",
    watermark: str = "10 minutes",
    role_values: Sequence[str] | None = None,
    tool_values: Sequence[str] | None = None,
) -> DataFrame:
    """Event-time tumbling rollup over a streaming DataFrame.

    Output mode should be "append" (finalized windows only) or "update".
    """
    win = F.window(ts, TIER_DURATION[tier])
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(key, win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            counts_map(F.col("role"), role_values).alias("role_counts"),
            counts_map(F.col("tool"), tool_values).alias("tool_counts"),
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts"),
        )
        .select(
            key,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "turn_count",
            "role_counts",
            "tool_counts",
            "first_ts",
            "last_ts",
        )
    )
