"""Tumbling-window rollups + retention-tier cascade.

This is the recast of GMQL's MAP operator (``IRGenometricMap``,
``IROperators.scala:378-380``; Spark impl
``GenometricMap71.scala:23-203``): the reference bins regions, joins
ref×exp by (bin, chrom) with replication, and runs per-column aggregates
with a two-level combine (in-bin reduce then ``reduceByKey`` across bins,
``GenometricMap71.scala:110-123``). For tumbling event-time windows no
join is needed at all: ``groupBy(conv_id, window(ts, Δ))`` *is* the
binning, and Catalyst's hash aggregate *is* the two-level
partial/final combine.

Scale notes:
- one shuffle for the lag window (by conv_id), one for the aggregate
  (by conv_id+window). When the input table is written bucketed by
  conv_id (catalog.write_transcripts), the first shuffle reads
  co-located data.
- percentiles are exact (``F.percentile``), computed per tier from the
  raw gap column; all other stats cascade tier→tier (see
  ``cascade_rollup``) so the 1h/1d jobs read the much smaller 1m tier
  for mergeable stats. At 100 TB raw / ~1 TB of 1m points this is the
  difference between re-scanning raw three times and once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gmql_spark.functions.aggregates import counts_map, merge_counts_maps

TIER_DURATION = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}
# fan-in of each tier from the previous one (for cascade)
TIER_PARENT = {"1h": "1m", "1d": "1h"}

PCTS = (0.50, 0.95, 0.99)
PCT_NAMES = ("latency_p50", "latency_p95", "latency_p99")


def with_gap_seconds(
    df: DataFrame,
    key: str = "conv_id",
    order: str | Sequence[str] = "turn_idx",
    ts: str = "ts",
) -> DataFrame:
    """Add ``gap_s``: seconds since the previous turn of the conversation
    (stable order = turn_idx), null for the first turn.

    Computed in integer microseconds first (``unix_micros``) so the double
    result is bit-identical to the pandas/DuckDB oracles."""
    order_cols = [order] if isinstance(order, str) else list(order)
    w = Window.partitionBy(key).orderBy(*order_cols)
    us = F.unix_micros(F.col(ts))
    return df.withColumn("gap_us", us - F.lag(us).over(w)).withColumn(
        "gap_s", F.col("gap_us") / F.lit(1e6)
    )


def rollup(
    df: DataFrame,
    tier: str = "1m",
    key: str = "conv_id",
    ts: str = "ts",
    role_values: Sequence[str] | None = None,
    tool_values: Sequence[str] | None = None,
    with_gaps: bool = True,
) -> DataFrame:
    """Direct rollup of raw transcripts to one retention tier.

    Output grain: (key, window_start). Columns: turn_count,
    role_counts/tool_counts (map<string,bigint>), exact latency
    percentiles p50/p95/p99 over inter-turn gaps, latency_cnt/sum,
    first_ts/last_ts.
    """
    if with_gaps:
        df = with_gap_seconds(df, key=key, ts=ts)
    win = F.window(ts, TIER_DURATION[tier])
    # one percentile buffer for all three points (array form), split after
    pct_arr = F.percentile("gap_s", F.array(*[F.lit(p) for p in PCTS])).alias("_pcts")
    aggs = [
        F.count(F.lit(1)).alias("turn_count"),
        counts_map(F.col("role"), role_values).alias("role_counts"),
        counts_map(F.col("tool"), tool_values).alias("tool_counts"),
        pct_arr,
        F.count("gap_s").alias("latency_cnt"),
        # exact integer-µs sum: order-independent across partial aggs AND
        # across tier cascades (long addition is associative; double is not)
        F.sum("gap_us").alias("latency_sum_us"),
        F.min(ts).alias("first_ts"),
        F.max(ts).alias("last_ts"),
    ]
    return (
        df.groupBy(key, win.alias("w"))
        .agg(*aggs)
        .select(
            key,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "turn_count",
            "role_counts",
            "tool_counts",
            *[F.col("_pcts")[i].alias(n) for i, n in enumerate(PCT_NAMES)],
            "latency_cnt",
            "latency_sum_us",
            "first_ts",
            "last_ts",
        )
    )


def cascade_rollup(finer: DataFrame, tier: str, key: str = "conv_id") -> DataFrame:
    """Re-aggregate a finer tier to a coarser one for all *mergeable*
    stats (counts, histogram maps, min/max, sums). Percentiles are not
    mergeable and are absent from the result — join in
    ``percentiles_for_tier`` (exact-from-raw) or accept sketches.

    Composition laws verified by tests: sum∘count = count, map-merge of
    value-counts = value-counts of union, min∘min, max∘max.
    """
    win = F.window("window_start", TIER_DURATION[tier])
    return (
        finer.groupBy(key, win.alias("w"))
        .agg(
            F.sum("turn_count").alias("turn_count"),
            merge_counts_maps("role_counts").alias("role_counts"),
            merge_counts_maps("tool_counts").alias("tool_counts"),
            F.sum("latency_cnt").alias("latency_cnt"),
            F.sum("latency_sum_us").alias("latency_sum_us"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
        )
        .select(
            key,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "turn_count",
            "role_counts",
            "tool_counts",
            "latency_cnt",
            "latency_sum_us",
            "first_ts",
            "last_ts",
        )
    )


def percentiles_for_tier(
    raw: DataFrame, tier: str, key: str = "conv_id", ts: str = "ts", with_gaps: bool = True
) -> DataFrame:
    """Exact latency percentiles at a tier's grain, from raw gaps.

    Cheap relative to a full rollup: single hash-agg over (key, window)
    with map-side partial collection of gaps only."""
    if with_gaps:
        raw = with_gap_seconds(raw, key=key, ts=ts)
    win = F.window(ts, TIER_DURATION[tier])
    return (
        raw.groupBy(key, win.alias("w"))
        .agg(F.percentile("gap_s", F.array(*[F.lit(p) for p in PCTS])).alias("_pcts"))
        .select(
            key,
            F.col("w.start").alias("window_start"),
            *[F.col("_pcts")[i].alias(n) for i, n in enumerate(PCT_NAMES)],
        )
    )


def rollup_tier_from(
    finer: DataFrame,
    raw: DataFrame,
    tier: str,
    key: str = "conv_id",
    ts: str = "ts",
    with_gaps: bool = True,
) -> DataFrame:
    """Full coarser-tier rollup = cascade(mergeables from finer tier)
    ⨝ exact percentiles from raw. The join keys are (key, window_start)
    at identical grain, both sides already hash-partitioned by the
    aggregate — Catalyst plans a shuffle-free sort-merge or reuses the
    exchange under AQE."""
    merged = cascade_rollup(finer, tier, key=key)
    pct = percentiles_for_tier(raw, tier, key=key, ts=ts, with_gaps=with_gaps)
    out = merged.join(pct, on=[key, "window_start"], how="left")
    return out.select(
        key,
        "window_start",
        "window_end",
        "turn_count",
        "role_counts",
        "tool_counts",
        *PCT_NAMES,
        "latency_cnt",
        "latency_sum_us",
        "first_ts",
        "last_ts",
    )


def rollup_all_tiers(
    raw: DataFrame,
    tiers: Sequence[str] = ("1m", "1h", "1d"),
    key: str = "conv_id",
    ts: str = "ts",
    role_values: Sequence[str] | None = None,
    tool_values: Sequence[str] | None = None,
    cache_gaps: bool = False,
) -> dict[str, DataFrame]:
    """The retention cascade raw → 1m → 1h → 1d. Gap column is computed
    once; the raw-with-gaps frame feeds the 1m rollup and each tier's
    exact-percentile pass (``cache_gaps=True`` persists it across those
    consumers — the common-subplan reuse the reference does with
    ``intermediateResult`` memoization, ``IROperator.scala:11``)."""
    raw_g = with_gap_seconds(raw, key=key, ts=ts)
    if cache_gaps:
        raw_g = raw_g.persist()
    out: dict[str, DataFrame] = {}
    prev = None
    for t in tiers:
        if prev is None:
            out[t] = rollup(
                raw_g, t, key=key, ts=ts, with_gaps=False,
                role_values=role_values, tool_values=tool_values,
            )
        else:
            out[t] = rollup_tier_from(out[prev], raw_g, t, key=key, ts=ts, with_gaps=False)
        prev = t
    return out
