"""Dataset profiling (GMQL-Profiler analogue).

The reference writes ``profile.xml`` per materialization with sample
counts, region counts, min/max coordinates and average region length
(``GMQL-Profiler/.../Profiler.scala:66-68,104-160``). Recast: one-row
profile of a transcript table — exact counts, key cardinality, event-time
span, text-length stats — all in a single hash-agg pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    key: str = "conv_id",
    ts: str = "ts",
    text_col: str = "text",
    approx: bool = False,
) -> DataFrame:
    """One-row profile: exact counts, key cardinality, event-time span,
    and text-length stats when ``text_col`` is present (min/max/avg
    length + total bytes — the reference's average-region-length
    analogue). ``approx=True`` swaps the exact distinct for
    approx_count_distinct — the right cardinality at 100 TB, where an
    exact countDistinct is a full extra shuffle."""
    card = (
        F.approx_count_distinct(key) if approx else F.countDistinct(key)
    ).alias("n_keys")
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        card,
        F.min(ts).alias("min_ts"),
        F.max(ts).alias("max_ts"),
    ]
    if text_col in df.columns:
        length = F.length(text_col)
        aggs += [
            F.min(length).alias("text_len_min"),
            F.max(length).alias("text_len_max"),
            F.avg(length).alias("text_len_avg"),
            F.sum(length.cast("long")).alias("text_len_sum"),
        ]
    return df.agg(*aggs)


def profile_per_key(df: DataFrame, key: str = "conv_id", ts: str = "ts") -> DataFrame:
    """Per-key profile (the reference's per-sample stats)."""
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(ts).alias("min_ts"),
        F.max(ts).alias("max_ts"),
    )
