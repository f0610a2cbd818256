"""Gate-shaped tests for ``streaming.materialize.run_rollup_to_table``:
the real availableNow drain-and-stop run behind the ``stream_rollup``
driver gate. Pins the lambda-split contract — emitted (watermark-closed,
flowed through the streaming sink) plus a batch tail past the boundary
must exactly partition and reproduce the batch rollup."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from gmql_spark import datagen
from gmql_spark.operators.window_agg import window_rollup
from gmql_spark.streaming.materialize import run_rollup_to_table


def _run(spark, tmp_path, raw, duration="1 minute", watermark="10 minutes"):
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
    ]
    emitted, boundary = run_rollup_to_table(
        spark,
        raw,
        str(tmp_path / "work"),
        duration,
        aggs=aggs,
        keys=["conv_id"],
        watermark=watermark,
    )
    batch = window_rollup(raw, duration, aggs=aggs, keys=["conv_id"])
    return emitted, boundary, batch


def test_emitted_plus_tail_equals_batch(spark, tmp_path):
    raw = datagen.transcripts_spark(spark, n_conv=40).select("conv_id", "ts", "text")
    emitted, boundary, batch = _run(spark, tmp_path, raw)
    assert boundary is not None, "data span must exceed the watermark"

    # the two sides partition the window axis on the boundary
    assert emitted.filter(F.col("window_end") > F.lit(boundary)).count() == 0
    tail = batch.filter(F.col("window_end") > F.lit(boundary))
    assert tail.count() > 0, "append mode must withhold the final windows"

    cols = ["conv_id", "window_start", "window_end", "n", "chars"]
    got = (
        emitted.select(*cols)
        .unionByName(tail.select(*cols))
        .toPandas()
        .sort_values(["conv_id", "window_start"])
        .reset_index(drop=True)
    )
    exp = (
        batch.select(*cols)
        .toPandas()
        .sort_values(["conv_id", "window_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # every emitted row flowed through the stateful agg: it must also be
    # bit-identical to the batch twin on the emitted half of the axis
    head = (
        batch.filter(F.col("window_end") <= F.lit(boundary))
        .select(*cols)
        .toPandas()
        .sort_values(["conv_id", "window_start"])
        .reset_index(drop=True)
    )
    em = (
        emitted.select(*cols)
        .toPandas()
        .sort_values(["conv_id", "window_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(em, head, check_dtype=False)


def test_all_withheld_run_yields_empty_frame(spark, tmp_path):
    # span < watermark: append mode closes nothing; boundary is None and
    # the emitted frame reads back empty (schema'd read, not an error)
    raw = datagen.transcripts_spark(spark, n_conv=3).select("conv_id", "ts", "text")
    span = raw.agg(
        (F.max("ts").cast("long") - F.min("ts").cast("long")).alias("s")
    ).first()["s"]
    emitted, boundary, _ = _run(
        spark, tmp_path, raw, duration="1 minute", watermark=f"{span + 3600} seconds"
    )
    assert boundary is None
    assert emitted.count() == 0
    assert emitted.columns == ["conv_id", "window_start", "window_end", "n", "chars"]


def test_null_ts_rows_never_stick_in_state(spark, tmp_path):
    raw = datagen.transcripts_spark(spark, n_conv=10).select("conv_id", "ts", "text")
    with_null = raw.unionByName(
        raw.limit(5).withColumn("ts", F.lit(None).cast("timestamp"))
    )
    emitted, boundary, batch = _run(spark, tmp_path, with_null)
    assert boundary is not None
    # batch twin also drops null-ts (window(null) -> null group filtered)
    assert emitted.filter(F.col("window_start").isNull()).count() == 0
