"""Salted two-phase agg == direct agg (equality law) and tier-aware
retention expiry."""

from __future__ import annotations

from datetime import date

import pandas as pd
from pyspark.sql import functions as F

from gmql_spark import datagen
from gmql_spark.operators.rollup import with_gap_seconds
from gmql_spark.operators.skew import salted_conv_stats
from gmql_spark.retention import apply_retention, expire_partitions
from gmql_spark.sources.catalog import write_transcripts


def test_salted_equals_direct(spark):
    raw = with_gap_seconds(datagen.transcripts_spark(spark, n_conv=60))
    direct = (
        raw.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.sum("gap_us").alias("latency_sum_us"),
        )
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    salted = (
        salted_conv_stats(raw, n_salts=8)
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(direct, salted[direct.columns], check_dtype=False)


def test_asof_join_hot_key(spark):
    """Documented hot-key bound of asof_join: one key holding 2x10^5
    rows must still complete and stay correct (its history sorts in one
    partition — the per-key parallelism floor the docstring states)."""
    from gmql_spark.operators.join import asof_join

    n = 200_000
    left = spark.range(n).select(
        F.lit("hot").alias("k"),
        F.timestamp_micros((F.col("id") * 1_000_000 + 500_000).cast("long")).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(n).select(
        F.lit("hot").alias("k"),
        F.timestamp_micros((F.col("id") * 1_000_000).cast("long")).alias("ts"),
    )
    out = asof_join(left, right, keys=["k"], ts="ts", right_cols=())
    # every left row at t+0.5s matches the right row at t exactly
    bad = out.filter(
        F.unix_micros("ts") - F.unix_micros("ts_right") != 500_000
    ).count()
    assert bad == 0
    assert out.count() == n


def test_retention_expiry(spark, tmp_path):
    raw = datagen.transcripts_spark(spark, n_conv=40)
    wh = tmp_path / "wh"
    write_transcripts(raw, str(wh / "transcripts"), n_buckets=2)

    # datagen spans 2026-01; expire everything before 2026-01-15
    as_of = date(2026, 1, 25)
    expired = expire_partitions(str(wh / "transcripts"), keep_days=10, as_of=as_of)
    assert expired and all("event_date=2026-01-0" in p or "event_date=2026-01-1" in p for p in expired)

    back = spark.read.parquet(str(wh / "transcripts"))
    assert back.count() > 0
    min_date = back.agg(F.min("event_date")).collect()[0][0]
    assert min_date >= date(2026, 1, 15)

    # dry-run reports but deletes nothing
    before = back.count()
    rep = apply_retention(str(wh), {"raw": 5}, as_of=as_of, dry_run=True)
    assert rep["raw"]
    assert spark.read.parquet(str(wh / "transcripts")).count() == before


def test_sessionize_hot_key(spark):
    """Documented hot-key bound of sessionize: one conversation holding
    10^6 turns must complete and stay exact (its history sorts in one
    partition — the per-key parallelism floor the docstring states).
    Events tick every 1 s with a >timeout jump every 1000 events, so the
    expected output is exactly 1000 sessions of 1000 turns each."""
    from gmql_spark.operators.session import sessionize

    n, per = 1_000_000, 1000
    # ts = id*1s + 3600s per completed block => inter-block gap = 3601 s
    df = spark.range(n).select(
        F.lit("hot").alias("conv_id"),
        F.timestamp_micros(
            (F.col("id") * 1_000_000 + (F.col("id") / per).cast("long") * 3_600_000_000).cast("long")
        ).alias("ts"),
    )
    out = sessionize(df, gap_timeout_s=1800.0)
    assert out.count() == n // per
    assert out.filter(F.col("n_turns") != per).count() == 0
    # every session spans exactly (per-1) seconds
    span_bad = out.filter(
        F.unix_micros("session_end") - F.unix_micros("session_start")
        != (per - 1) * 1_000_000
    ).count()
    assert span_bad == 0


def test_compact_partitions(spark, tmp_path):
    """Compaction rewrites fragmented date partitions into one file each
    without changing the data, and leaves un-fragmented partitions'
    files untouched."""
    import os

    from gmql_spark import datagen
    from gmql_spark.retention import compact_partitions

    raw = datagen.transcripts_spark(spark, n_conv=20)
    path = str(tmp_path / "tier")
    frag = raw.withColumn("window_date", F.to_date("ts")).repartition(8)
    frag.write.mode("overwrite").partitionBy("window_date").parquet(path)

    def files_per_part():
        return {
            d.split("=", 1)[1]: sum(
                1 for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")
            )
            for d in os.listdir(path) if d.startswith("window_date=")
        }

    before_rows = spark.read.parquet(path).toPandas()
    before = files_per_part()
    assert any(v > 2 for v in before.values())
    rewritten = compact_partitions(spark, path, min_files=2)
    assert set(rewritten) == {k for k, v in before.items() if v > 2}
    after = files_per_part()
    assert all(after[k] == 1 for k in rewritten)
    # untouched partitions keep their file counts
    assert all(after[k] == v for k, v in before.items() if k not in rewritten)
    after_rows = spark.read.parquet(path).toPandas()
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        before_rows.sort_values(key).reset_index(drop=True)[sorted(before_rows.columns)],
        after_rows.sort_values(key).reset_index(drop=True)[sorted(after_rows.columns)],
    )


# ------------------------------- range-salt paths (round 4)


def test_asof_salted_equals_unsalted(spark):
    """salt_bucket_s asof == unsalted on mixed skewed data: many keys,
    gaps larger than the bucket (carry-in must stitch across several
    empty buckets), null right attributes (per-column carry), both
    directions, and tolerance."""
    import random

    from gmql_spark.operators.join import asof_join

    rng = random.Random(41)
    lrows, rrows = [], []
    for k in ("a", "b", "hot"):
        n = 400 if k == "hot" else 40
        t = 0
        for i in range(n):
            t += rng.randint(1, 7200)  # gaps up to 2h vs 600s buckets
            lrows.append((k, t * 1_000_000, len(lrows)))
        t = 3
        for i in range(n):
            t += rng.randint(1, 9000)
            # sprinkle null attribute values to exercise per-column carry
            rrows.append((k, t * 1_000_000, None if i % 5 == 0 else i))
    left = spark.createDataFrame(lrows, "k string, us long, lid long").select(
        "k", F.timestamp_micros("us").alias("ts"), "lid"
    )
    right = spark.createDataFrame(rrows, "k string, us long, val long").select(
        "k", F.timestamp_micros("us").alias("ts"), "val"
    )

    for direction in ("backward", "forward"):
        for tol in (None, 1800.0):
            base = asof_join(
                left, right, keys=["k"], ts="ts", right_cols=("val",),
                direction=direction, tolerance_s=tol,
            )
            salted = asof_join(
                left, right, keys=["k"], ts="ts", right_cols=("val",),
                direction=direction, tolerance_s=tol, salt_bucket_s=600.0,
            )
            b = {tuple(r) for r in base.collect()}
            s = {tuple(r) for r in salted.collect()}
            assert s == b, (direction, tol, len(s ^ b))


def test_sessionize_salted_equals_unsalted(spark):
    """salt_bucket_s sessionize == unsalted (same idx/start/end/count):
    sessions spanning many buckets, singleton sessions, sessions exactly
    at bucket edges."""
    import random

    from gmql_spark.operators.session import sessionize

    rng = random.Random(43)
    rows = []
    for k in ("x", "y", "hot"):
        n = 600 if k == "hot" else 60
        t = rng.randint(0, 120)
        for _ in range(n):
            # 70% short gaps (same session), 30% > timeout
            t += rng.randint(1, 120) if rng.random() < 0.7 else rng.randint(
                1900, 30000
            )
            rows.append((k, t * 1_000_000))
    df = spark.createDataFrame(rows, "conv_id string, us long").select(
        "conv_id", F.timestamp_micros("us").alias("ts")
    )
    base = sessionize(df, gap_timeout_s=1800.0)
    salted = sessionize(df, gap_timeout_s=1800.0, salt_bucket_s=600.0)
    b = {tuple(r) for r in base.collect()}
    s = {tuple(r) for r in salted.collect()}
    assert s == b, len(s ^ b)


def test_asof_salted_hot_key_5m(spark):
    """5x10^6-row single key through the salted path: parallelism =
    bucket count (the unsalted window would sort all rows in ONE
    partition). Grid-aligned rights give a closed-form expected match."""
    from gmql_spark.operators.join import asof_join

    n = 5_000_000
    left = spark.range(n).select(
        F.lit("hot").alias("k"),
        F.timestamp_micros((F.col("id") * 1_000_000 + 500_000).cast("long")).alias("ts"),
    )
    right = spark.range(n // 100).select(
        F.lit("hot").alias("k"),
        F.timestamp_micros((F.col("id") * 100_000_000).cast("long")).alias("ts"),
    )
    out = asof_join(
        left, right, keys=["k"], ts="ts", right_cols=(), salt_bucket_s=3600.0
    )
    # every left ts floors to the previous 100s grid point
    bad = out.filter(
        F.col("ts_right").isNull()
        | (
            F.unix_micros("ts_right")
            != (F.unix_micros("ts") / 100_000_000).cast("long") * 100_000_000
        )
    ).count()
    assert bad == 0
    assert out.count() == n


def test_compact_preserves_prior_crash_recovery_copies(spark, tmp_path):
    """A previous run's mid-swap crash leaves a partition ONLY in
    _compact_trash/_compact_tmp; a later compaction of other partitions
    must not delete those copies (they are the sole recovery source)."""
    import os
    import shutil

    from gmql_spark.retention import compact_partitions

    table = str(tmp_path / "tbl")
    df = spark.range(100).selectExpr(
        "id", "case when id % 2 = 0 then '2026-01-01' else '2026-01-02' end as window_date"
    )
    # fragment both partitions (several files each)
    df.repartition(4).write.partitionBy("window_date").parquet(table)

    # simulate run-1 crash on D1: leaf moved to trash (and a stage copy
    # left behind), table missing the partition
    d1, d2 = "window_date=2026-01-01", "window_date=2026-01-02"
    os.makedirs(f"{table}/_compact_trash", exist_ok=True)
    os.rename(f"{table}/{d1}", f"{table}/_compact_trash/{d1}")
    shutil.copytree(f"{table}/_compact_trash/{d1}", f"{table}/_compact_tmp/{d1}")

    # run 2 compacts the remaining partition
    rewritten = compact_partitions(spark, table, min_files=1)
    assert set(rewritten) == {"2026-01-02"}

    # the crash-recovery copies survived
    assert os.path.isdir(f"{table}/_compact_trash/{d1}")
    assert os.path.isdir(f"{table}/_compact_tmp/{d1}")
    # and recovery by rename restores the partition
    os.rename(f"{table}/_compact_trash/{d1}", f"{table}/{d1}")
    back = spark.read.parquet(table)
    assert back.count() == 100
    n_files = sum(
        1 for f in os.listdir(f"{table}/{d2}") if f.endswith(".parquet")
    )
    assert n_files == 1  # D2 actually compacted
