"""DIFFERENCE: keep left rows with no right row nearby (anti range join).

Recast of GMQL's GenometricDifference (``IRDifferenceRD``
``IROperators.scala:345-350``; ``GenometricDifference.scala:18-114``):
the reference bins + cogroups, counts overlapping exp regions per ref
(``:44-85``) and keeps count==0. Here the same two strategies, both
declarative:

- ``temporal_difference``: left_anti join on the bucketed equi-prefix
  (bucket ±1) with the range residual — Catalyst's anti-join keeps
  exactly the count==0 rows without materializing counts.
- ``exact=True`` (GMQL's exact-coordinate variant): plain left_anti
  equi-join on (keys, ts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temporal_difference(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    max_distance_s: float = 0.0,
    left_ts: str = "ts",
    right_ts: str = "ts",
    exact: bool = False,
) -> DataFrame:
    """Left rows with NO right row within ``max_distance_s`` seconds on
    the same keys (or at the exact same timestamp when ``exact``).

    ``max_distance_s=0`` means |Δts| <= 0, i.e. exact-timestamp matching —
    routed to the equi left_anti path (a clamped 1µs bucket would wrongly
    suppress rows exactly 1µs apart)."""
    if exact or max_distance_s <= 0.0:
        r = right.select(*keys, F.col(right_ts).alias(left_ts)).distinct()
        return left.join(r, on=[*keys, left_ts], how="left_anti")

    bucket_us = max(int(max_distance_s * 1e6), 1)
    lus = F.unix_micros(F.col(left_ts))
    rus = F.unix_micros(F.col(right_ts))
    lb = left.withColumn("_bucket", (lus / bucket_us).cast("long"))
    # replicate the RIGHT side to neighbor buckets (right is typically the
    # smaller filter set; GMQL replicates the reference side instead —
    # GenometricJoin.scala:284-331 — which amplifies the big side)
    rus2 = F.unix_micros(F.col("_rts"))
    rb = right.select(*keys, F.col(right_ts).alias("_rts")).withColumn(
        "_bucket",
        F.explode(
            F.sequence((rus2 / bucket_us).cast("long") - 1, (rus2 / bucket_us).cast("long") + 1)
        ),
    )
    cond = [
        lb["_bucket"] == rb["_bucket"],
        F.abs(F.unix_micros(lb[left_ts]) - F.unix_micros(rb["_rts"])) <= bucket_us,
    ]
    cond += [lb[k] == rb[k] for k in keys]
    return lb.join(rb, cond, "left_anti").drop("_bucket")
