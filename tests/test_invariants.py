"""North-rule invariants: per-turn text byte-equality through the
storage layer, and file-layout insensitivity of rollup results
(FIXTURES.md §4, mirroring the reference's bin-size-invariance sweeps
``conf/test_map.xml:3-9``)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from gmql_spark import datagen
from gmql_spark.operators.rollup import rollup
from gmql_spark.sources.catalog import read_transcripts, write_transcripts


def test_text_byte_equality_through_storage(spark, tmp_path):
    """text must survive ingest → bucketed storage → read byte-for-byte
    under the stable (conv_id, turn_idx) ordering — including the empty /
    unicode / embedded-tab-newline cases datagen plants every 97th row."""
    pdf = datagen.gen_transcripts(n_conv=60)
    sdf = datagen.transcripts_spark(spark, n_conv=60)
    path = str(tmp_path / "fact")
    write_transcripts(sdf, path, n_buckets=4, precompute_gaps=True)

    back = (
        read_transcripts(spark, path)
        .select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = (
        pdf[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(back) == len(exp)
    # byte-level equality, not just string equality
    eq = [
        a.encode() == b.encode() for a, b in zip(back["text"], exp["text"], strict=True)
    ]
    assert all(eq), f"{sum(not x for x in eq)} texts differ"
    specials = exp["text"].str.contains("\t|\n", regex=True) | (exp["text"] == "")
    assert specials.any(), "fixture must include special-char cases"


def test_bucket_width_invariance(spark):
    """Bucketed-join results must not depend on the bucket width — the
    reference's bin-size sweep contract (``conf/test_map.xml:3-9``:
    results identical across binSize grid). Covers interval_join,
    temporal_difference and flat_cover across 3 widths each."""
    import datetime as dt

    from gmql_spark.operators.cover import flat_cover
    from gmql_spark.operators.difference import temporal_difference
    from gmql_spark.operators.join import interval_join

    T0 = dt.datetime(2026, 1, 1)
    m = lambda x: T0 + dt.timedelta(minutes=x)  # noqa: E731
    lv = spark.createDataFrame(
        [(i, "k", m(i * 7), m(i * 7 + 11)) for i in range(40)],
        "lid long, k string, start_ts timestamp, end_ts timestamp",
    )
    rv = spark.createDataFrame(
        [(i, "k", m(i * 5 + 2), m(i * 5 + 6)) for i in range(40)],
        "rid long, k string, start_ts timestamp, end_ts timestamp",
    )
    ref = None
    for w in (120.0, 600.0, 7200.0):
        got = sorted(
            (r.lid, r.rid)
            for r in interval_join(lv, rv, keys=["k"], bucket_s=w).collect()
        )
        assert ref is None or got == ref, f"bucket_s={w} changed interval_join"
        ref = got

    ev_l = lv.select("lid", "k", F.col("start_ts").alias("ts"))
    ev_r = rv.select("k", F.col("start_ts").alias("ts"))
    iv = lv.select("start_ts", "end_ts")
    base = None
    for w in (300.0, 1800.0, 86400.0):
        got = sorted(
            (r.cover_start, r.cover_end, r.flat_start, r.flat_end)
            for r in flat_cover(iv, min_acc=2, bucket_s=w).collect()
        )
        assert base is None or got == base, f"bucket_s={w} changed flat_cover"
        base = got

    kept = {r.lid for r in temporal_difference(ev_l, ev_r, keys=["k"], max_distance_s=90.0).collect()}
    exact = {
        r.lid
        for r in ev_l.join(
            ev_r.withColumnRenamed("ts", "rts"), "k"
        )
        .filter(F.abs(F.unix_micros("ts") - F.unix_micros("rts")) <= 90_000_000)
        .select("lid")
        .distinct()
        .collect()
    }
    assert kept == {r.lid for r in ev_l.collect()} - exact


def test_rollup_layout_invariance(spark, tmp_path):
    """Same rows in 1 file vs 40 shuffled files -> identical rollups."""
    sdf = datagen.transcripts_spark(spark, n_conv=50)
    p1, p2 = str(tmp_path / "one"), str(tmp_path / "many")
    sdf.coalesce(1).write.parquet(p1)
    sdf.orderBy(F.rand(7)).repartition(40).write.parquet(p2)

    def roll(path):
        df = spark.read.parquet(path)
        return (
            rollup(df, "1h")
            .toPandas()
            .sort_values(["conv_id", "window_start"])
            .reset_index(drop=True)
        )

    a, b = roll(p1), roll(p2)
    for col in a.columns:
        if a[col].map(lambda x: isinstance(x, dict)).any():
            assert all(dict(x) == dict(y) for x, y in zip(a[col], b[col]))
        else:
            pd.testing.assert_series_equal(a[col], b[col], check_names=False)
