"""PROJECT with interval/coordinate rewrite.

ProjectRD (``IROperators.scala:166-171``; ``ProjectRD.scala:22-119``)
can reassign the coordinates themselves (start/stop arithmetic with
strand-aware slots, clamp negative starts to 0, drop rows where
left >= right — ``COORD_POS`` slots and the drop rule). The time-series
recast: rewrite an interval pair (e.g. widen a turn's span, shift by a
lag, re-anchor windows) with the same clamp + drop-degenerate rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project_intervals(
    df: DataFrame,
    new_start: Column,
    new_end: Column,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    min_ts: str | None = None,
) -> DataFrame:
    """Rewrite interval bounds; clamp starts below ``min_ts`` (GMQL
    clamps left<0 to 0, ``ProjectRD.scala``), drop rows where
    start >= end (reference drops degenerate regions)."""
    out = df.withColumn("_ns", new_start).withColumn("_ne", new_end)
    if min_ts is not None:
        out = out.withColumn("_ns", F.greatest(F.col("_ns"), F.lit(min_ts).cast("timestamp")))
    out = out.filter(F.col("_ns") < F.col("_ne"))
    return (
        out.drop(start_col, end_col)
        .withColumnRenamed("_ns", start_col)
        .withColumnRenamed("_ne", end_col)
    )
