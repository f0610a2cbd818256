"""Generic event-time window aggregation (the MAP/GROUP recast).

``window_rollup`` is the engine's generic tumbling/sliding-window
aggregate: GMQL's GenometricMap for tumbling windows needs no join at
all (``groupBy(keys, window(ts, Δ))`` is the binning —
``GenometricMap71.scala:152-182`` replicates to bins by hand), and
GMQL's GroupRD (``GroupRD.scala:17-66``: md5-keyed coordinate grouping +
aggregates) is ``groupBy`` with the window struct as the coordinate.

Sliding windows use Spark's native ``window(ts, size, slide)`` generator
(one row per covered window — the same replication strategy as the
reference's bin flatMap, but planned by Catalyst with whole-stage
codegen).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def window_rollup(
    df: DataFrame,
    duration: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    ts: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) window aggregate.

    Output: keys + window_start + window_end + the aliased aggregates.
    """
    win = F.window(ts, duration, slide) if slide else F.window(ts, duration)
    out = df.groupBy(*keys, win.alias("w")).agg(*aggs)
    return out.select(
        *keys,
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c not in (*keys, "w")],
    )


def cascade(
    finer: DataFrame,
    duration: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Re-aggregate a finer window_rollup output to a coarser grain
    (mergeable stats only — the caller supplies the merge aggregates,
    e.g. sum over counts)."""
    win = F.window("window_start", duration)
    out = finer.groupBy(*keys, win.alias("w")).agg(*aggs)
    return out.select(
        *keys,
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c not in (*keys, "w")],
    )
