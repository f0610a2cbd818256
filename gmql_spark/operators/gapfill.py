"""Gap-fill: materialize empty windows, LOCF, linear interpolation.

GMQL analogue: MAP's left-outer semantics — reference regions with zero
matching experiment regions still emit a row with count 0
(``GenometricMap71.scala:109-120``: refs joined with default (0, null
aggrs)). Here the "reference frame" is the dense per-conversation window
grid, synthesized with ``sequence()`` + ``explode`` (a Catalyst
generator — the reference's binning flatMap replication,
``GenometricMap71.scala:152-182``, plays the same role).

All three fills are native window functions — no Python:
- zero-fill:   coalesce after the grid left-join
- LOCF:        last(value, ignoreNulls) over rows unbounded preceding
- linear:      prev/next known value + timestamps via
               last/first(ignoreNulls) forward & backward windows, then
               pure arithmetic

Scale notes: the grid explode is proportional to *output* rows (dense
series), not input turns; everything stays partitioned by conv_id —
the grid join and the window functions share the same hash partitioning,
so Catalyst plans a single shuffle of the (small) rollup tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gmql_spark.operators.rollup import TIER_DURATION

TIER_STEP = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}


def window_grid(rollup_df: DataFrame, tier: str = "1m", key: str = "conv_id") -> DataFrame:
    """Dense (key, window_start) grid spanning each key's min..max window."""
    step = F.expr(f"interval {TIER_STEP[tier]}")
    return (
        rollup_df.groupBy(key)
        .agg(F.min("window_start").alias("w0"), F.max("window_start").alias("w1"))
        .select(
            key,
            F.explode(F.sequence(F.col("w0"), F.col("w1"), step)).alias("window_start"),
        )
    )


def gapfill(
    rollup_df: DataFrame,
    tier: str = "1m",
    key: str = "conv_id",
    value_col: str = "turn_count",
    interp_col: str | None = "latency_p50",
) -> DataFrame:
    """Dense series with ``is_gap`` flag, zero-filled ``value_col``, LOCF
    column ``{value_col}_locf`` and (when ``interp_col`` is given) a
    linearly interpolated ``latency_interp`` (nullable at edges / before
    the first and after the last known point)."""
    grid = window_grid(rollup_df, tier, key)
    picked = [key, "window_start", value_col] + ([interp_col] if interp_col else [])
    joined = grid.join(rollup_df.select(*picked), on=[key, "window_start"], how="left")

    w_all_prev = (
        Window.partitionBy(key).orderBy("window_start").rowsBetween(Window.unboundedPreceding, 0)
    )
    base = joined.select(
        key,
        "window_start",
        F.coalesce(F.col(value_col), F.lit(0)).alias(value_col),
        F.col(value_col).isNull().alias("is_gap"),
        F.last(value_col, ignorenulls=True).over(w_all_prev).alias(f"{value_col}_locf"),
        *([interp_col] if interp_col else []),
    )
    if not interp_col:
        return base
    joined = base
    w_all_next = (
        Window.partitionBy(key).orderBy("window_start").rowsBetween(0, Window.unboundedFollowing)
    )
    ws_s = F.unix_timestamp("window_start")  # epoch seconds (long)
    known_ts = F.when(F.col(interp_col).isNotNull(), ws_s)

    prev_v = F.last(interp_col, ignorenulls=True).over(w_all_prev)
    prev_t = F.last(known_ts, ignorenulls=True).over(w_all_prev)
    next_v = F.first(interp_col, ignorenulls=True).over(w_all_next)
    next_t = F.first(known_ts, ignorenulls=True).over(w_all_next)

    frac = (ws_s - prev_t).cast("double") / (next_t - prev_t).cast("double")
    interp = (
        F.when(F.col(interp_col).isNotNull(), F.col(interp_col))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        )
        .otherwise(F.lit(None).cast("double"))
    )

    return joined.select(
        key,
        "window_start",
        value_col,
        "is_gap",
        f"{value_col}_locf",
        interp.alias("latency_interp"),
    )
