"""COVER family: interval accumulation via event-time prefix sums.

Recast of GMQL's GenometricCover (``IRRegionCover``
``IROperators.scala:262-268``; ``GenometricCover.scala:24-363``): the
reference extracts ±1 point events at interval starts/stops
(``GenometricCover.scala:345-360``), sorts per (chr, bin, group) and
sweeps a prefix sum in memory per bin, then stitches bin-boundary
islands back together (``:120-152``).

Here the sweep is a cumulative window function over the delta events —
no binning, no stitching, planned by Catalyst:

  +1 at start, −1 at end → groupBy(time) sum → running sum → islands.

Variants (``CoverFlag``):
- ``accumulation`` ≙ HISTOGRAM: one row per maximal run of constant
  accumulation level (``coverHelper`` ``:229-258``).
- ``cover(min_acc, max_acc)`` ≙ COVER: maximal intervals where
  min<=acc<=max, value = max acc inside (``:172-218``).
- ``summits`` ≙ SUMMIT: local maxima runs (``:269-316``).

Transcript recast: concurrent-conversation / concurrent-tool-call
density over time; count==0 islands are the gap-detection targets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def accumulation(
    df: DataFrame,
    keys: Sequence[str] = (),
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
) -> DataFrame:
    """Per change-point accumulation: rows (keys, acc_start, acc_end, acc)
    — the step function of how many [start_ts, end_ts) intervals overlap
    each instant. Rows with acc=0 (gaps between islands) are omitted.

    HISTOGRAM semantics: consecutive equal-acc runs are merged.
    """
    deltas = df.select(
        *keys, F.col(start_ts).alias("t"), F.lit(1).alias("d")
    ).unionByName(df.select(*keys, F.col(end_ts).alias("t"), F.lit(-1).alias("d")))
    # net delta per distinct instant, then running sum = acc level in [t, next_t)
    per_t = deltas.groupBy(*keys, "t").agg(F.sum("d").alias("d")).filter(F.col("d") != 0)
    if keys:
        w = Window.partitionBy(*keys).orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
        w_next = Window.partitionBy(*keys).orderBy("t")
        stepped = per_t.withColumn("acc", F.sum("d").over(w)).withColumn(
            "next_t", F.lead("t").over(w_next)
        )
    else:
        # keyless sweep: a global Window would funnel everything through
        # ONE partition (the reference has the same issue per chromosome
        # — a hot chrom is a hot bin). Distributed two-level prefix sum:
        # range-partition by t, partition-local cumsum, then add each
        # partition's offset (cumsum of tiny per-partition totals joined
        # back by partition id). lead() for next_t is partition-local
        # too; the last row of each partition takes the next partition's
        # first t from the same tiny frame.
        parts = per_t.repartitionByRange("t").sortWithinPartitions("t")
        parts = parts.withColumn("_pid", F.spark_partition_id())
        w_local = (
            Window.partitionBy("_pid").orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
        )
        w_plocal = Window.partitionBy("_pid").orderBy("t")
        local = parts.withColumn("_local_acc", F.sum("d").over(w_local)).withColumn(
            "_local_next", F.lead("t").over(w_plocal)
        )
        ptotals = (
            local.groupBy("_pid")
            .agg(F.sum("d").alias("_ptotal"), F.min("t").alias("_pfirst"))
        )
        w_p = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
        w_pn = Window.orderBy("_pid")
        offsets = ptotals.select(
            "_pid",
            F.coalesce(F.sum("_ptotal").over(w_p), F.lit(0)).alias("_offset"),
            F.lead("_pfirst").over(w_pn).alias("_next_pfirst"),
        )
        stepped = (
            local.join(F.broadcast(offsets), "_pid")
            .withColumn("acc", F.col("_local_acc") + F.col("_offset"))
            .withColumn("next_t", F.coalesce(F.col("_local_next"), F.col("_next_pfirst")))
            .drop("_pid", "_local_acc", "_local_next", "_offset", "_next_pfirst", "_pfirst")
        )
    return (
        stepped.filter(F.col("acc") > 0)
        .filter(F.col("next_t").isNotNull())
        .select(
            *keys,
            F.col("t").alias("acc_start"),
            F.col("next_t").alias("acc_end"),
            F.col("acc").cast("long").alias("acc"),
        )
    )


def cover(
    df: DataFrame,
    min_acc: int = 1,
    max_acc: int | None = None,
    keys: Sequence[str] = (),
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
) -> DataFrame:
    """Maximal intervals where min_acc <= accumulation <= max_acc, with
    acc_max = the max accumulation inside the island (COVER semantics,
    ``GenometricCover.scala:172-218``). Island merge = sessionization:
    a cumulative flag over "previous segment not in range"."""
    acc = accumulation(df, keys=keys, start_ts=start_ts, end_ts=end_ts)
    in_range = F.col("acc") >= min_acc
    if max_acc is not None:
        in_range = in_range & (F.col("acc") <= max_acc)
    w = Window.partitionBy(*keys).orderBy("acc_start")
    flagged = acc.filter(in_range).withColumn(
        "_new_island",
        F.when(F.lag("acc_end").over(w) == F.col("acc_start"), F.lit(0)).otherwise(F.lit(1)),
    )
    w_cum = Window.partitionBy(*keys).orderBy("acc_start").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = flagged.withColumn("_island", F.sum("_new_island").over(w_cum))
    return (
        islands.groupBy(*keys, "_island")
        .agg(
            F.min("acc_start").alias("cover_start"),
            F.max("acc_end").alias("cover_end"),
            F.max("acc").alias("acc_max"),
        )
        .drop("_island")
    )


def flat_cover(
    df: DataFrame,
    min_acc: int = 1,
    max_acc: int | None = None,
    keys: Sequence[str] = (),
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
) -> DataFrame:
    """FLAT variant (``GMAP4.scala:83-84``): like :func:`cover` but each
    island is widened to the full footprint of the intervals that touch
    it (min start / max end of contributors)."""
    from gmql_spark.operators.join import range_join  # noqa: F401 (doc xref)

    islands = cover(df, min_acc, max_acc, keys=keys, start_ts=start_ts, end_ts=end_ts)
    iv = df.select(
        *keys, F.col(start_ts).alias("_ivs"), F.col(end_ts).alias("_ive")
    )
    cond = [F.col("_ivs") < F.col("cover_end"), F.col("_ive") > F.col("cover_start")]
    joined = (
        islands.join(iv, on=list(keys), how="inner") if keys else islands.crossJoin(iv)
    ).filter(cond[0] & cond[1])
    return joined.groupBy(*keys, "cover_start", "cover_end", "acc_max").agg(
        F.min("_ivs").alias("flat_start"), F.max("_ive").alias("flat_end")
    )


def summits(
    df: DataFrame,
    keys: Sequence[str] = (),
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
) -> DataFrame:
    """Local-maximum accumulation runs (SUMMIT,
    ``GenometricCover.scala:269-316``): segments whose acc is >= both
    neighbors' (strictly greater than at least one side handled by the
    island dedup — first segment of each equal-acc plateau wins)."""
    acc = accumulation(df, keys=keys, start_ts=start_ts, end_ts=end_ts)
    w = Window.partitionBy(*keys).orderBy("acc_start")
    prev_acc = F.lag("acc").over(w)
    next_acc = F.lead("acc").over(w)
    prev_end = F.lag("acc_end").over(w)
    next_start = F.lead("acc_start").over(w)
    # neighbor only counts if temporally adjacent (same island)
    left_acc = F.when(prev_end == F.col("acc_start"), prev_acc).otherwise(F.lit(0))
    right_acc = F.when(next_start == F.col("acc_end"), next_acc).otherwise(F.lit(0))
    return acc.withColumn("_l", left_acc).withColumn("_r", right_acc).filter(
        (F.col("acc") > F.col("_l")) & (F.col("acc") >= F.col("_r"))
    ).drop("_l", "_r")
