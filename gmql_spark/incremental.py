"""Incremental continuous-aggregate maintenance: append + targeted
tier refresh instead of full rebuilds.

North-rule: "continuous aggregates are materialized into retention
tiers". The batch path (``operators.rollup`` / ``checkpoint``) rebuilds
tiers from raw; at warehouse scale new transcript turns arrive
continuously and a rebuild re-scans everything. This module maintains
the tiers incrementally and EXACTLY:

1. ``append_transcripts`` lands a new batch into the bucketed fact
   table with the ingest-time ``gap_us`` column kept correct across
   batches: each conversation's previous last timestamp is read from a
   compact per-conversation state table (one row per conv — ≪ raw,
   bucketed like the fact table), so the first turn of a conv in the new
   batch gets the same gap a full-data window would compute. Requires
   per-conversation time-ordered appends (the natural transcript ingest
   order); out-of-order appends must go through a batch rebuild.

2. ``refresh_tiers`` recomputes ONLY the tier rows of the window-dates
   the new batch touched: tier tables are partitioned by
   ``window_date = to_date(window_start)``; 1m/1h/1d windows never cross
   a UTC date, and with ``gap_us`` stored in the fact table every tier
   row of date D depends only on raw rows of event_date D — so the
   refresh reads the pruned raw dates (PartitionFilters) and
   dynamic-partition-overwrites exactly those tier dates.

Exactness contract (tested): append in K batches + refresh after each
== one-shot rollup of the concatenation, bit-for-bit, per tier.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gmql_spark.sources.catalog import N_BUCKETS_DEFAULT, write_transcripts

STATE_DIR = "_conv_state"


def _state_path(fact_path: str) -> str:
    return f"{fact_path}/{STATE_DIR}"


def read_conv_state(spark: SparkSession, fact_path: str) -> DataFrame | None:
    p = _state_path(fact_path)
    if not os.path.exists(p):
        return None
    return spark.read.parquet(p)


def append_transcripts(
    spark: SparkSession,
    new_df: DataFrame,
    fact_path: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
    key: str = "conv_id",
    ts: str = "ts",
    order: Sequence[str] = ("turn_idx",),
) -> list:
    """Append a batch with cross-batch-exact ``gap_us``; returns the
    list of event dates the batch touched (the refresh targets).

    The intra-batch gap is the usual per-conv lag; each conv's FIRST
    batch row takes its gap from the state table's last_ts (null if the
    conv is new). State update = merge of old state with the batch's
    per-conv max — one small-table write, no raw scan."""
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order])
    us = F.unix_micros(F.col(ts))
    batch = new_df.withColumn("_gap_intra", us - F.lag(us).over(w))

    state = read_conv_state(spark, fact_path)
    if state is not None:
        prev = state.select(key, F.col("last_us").alias("_prev_us"))
        batch = batch.join(F.broadcast(prev), on=key, how="left")
    else:
        batch = batch.withColumn("_prev_us", F.lit(None).cast("long"))
    batch = batch.withColumn(
        "gap_us",
        F.coalesce(F.col("_gap_intra"), us - F.col("_prev_us")),
    ).drop("_gap_intra", "_prev_us")

    write_transcripts(
        batch, fact_path, n_buckets=n_buckets, key=key, ts=ts, mode="append"
    )

    # state merge (conv_id -> max last_us across old state and batch)
    batch_state = batch.groupBy(key).agg(F.max(us).alias("last_us"))
    merged = (
        state.unionByName(batch_state).groupBy(key).agg(F.max("last_us").alias("last_us"))
        if state is not None
        else batch_state
    )
    tmp = _state_path(fact_path) + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = _state_path(fact_path)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(final)

    return [r.d for r in batch.select(F.to_date(ts).alias("d")).distinct().collect()]


def refresh_tiers(
    spark: SparkSession,
    fact_path: str,
    out_dir: str,
    dates: Sequence,
    tiers: Sequence[str] = ("1m", "1h", "1d"),
    key: str = "conv_id",
    ts: str = "ts",
) -> dict:
    """Recompute the tier rows of ``dates`` only (partition-pruned raw
    read + dynamic partition overwrite of the matching tier dates).

    Every window of every tier lies inside one UTC date, and the stored
    ``gap_us`` makes each window's stats independent of other dates —
    so per-date recompute is exact."""
    from gmql_spark.operators.rollup import rollup, rollup_tier_from

    dates = sorted({str(d) for d in dates})
    raw = (
        spark.read.parquet(fact_path)
        .filter(F.col("event_date").isin(dates))  # PartitionFilters prune
        .drop("conv_bucket", "event_date")
    )
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    stats = {}
    try:
        prev_df = None
        for tier in tiers:
            path = f"{out_dir}/rollup_{tier}"
            # with_gaps=True is the idempotent path here: raw carries the
            # stored gap_us, so with_gap_seconds only derives gap_s — no
            # raw-scale window shuffle
            if prev_df is None:
                df = rollup(raw, tier, key=key, ts=ts, with_gaps=True)
            else:
                df = rollup_tier_from(prev_df, raw, tier, key=key, ts=ts, with_gaps=True)
            out = df.withColumn("window_date", F.to_date("window_start"))
            out.write.mode("overwrite").partitionBy("window_date").parquet(path)
            prev_df = (
                spark.read.parquet(path)
                .filter(F.col("window_date").isin(dates))
                .drop("window_date")
            )
            stats[tier] = prev_df.count()
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    return {"dates": dates, "rows": stats}
