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


# ----------------------------------------------- multi-batch late-row drop


def test_multi_batch_late_rows_exactly_accounted(spark, tmp_path):
    """The HARD case: three files drained one-per-micro-batch, with
    later files carrying rows whose windows the advancing watermark has
    already closed. Asserts (a) the engine's per-batch watermark trail
    matches the max(ts)−delay prediction, (b) the predicted drop set is
    NON-empty and the engine really dropped exactly it, (c)
    emitted ∪ batch-recomputed-tail over the NON-dropped rows equals
    the batch rollup of the non-dropped rows — i.e. the full answer is
    exactly partitioned with the drops explicitly accounted."""
    import datetime as dt

    from gmql_spark.streaming.materialize import run_rollup_multi_batch

    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)

    def rows(*minutes):
        return spark.createDataFrame(
            [("u1", t0 + dt.timedelta(minutes=m)) for m in minutes],
            "user string, ts timestamp",
        )

    # Engine semantics (probed, pinned here): each batch MERGES its
    # input into state first, THEN evicts/emits windows closed by the
    # batch's watermark — so a row is dropped only when its window was
    # evicted by an EARLIER batch (window_end <= previous batch's wm).
    #
    # file 0 (batch 0, wm epoch): minutes 0..60
    # file 1 (batch 1, wm 00:50): 30 is late vs the CURRENT wm but its
    #   window is evicted in THIS batch -> still merged (n=2); 90 is new
    # file 2 (batch 2, wm 01:20): 35 targets a window evicted at batch 1
    #   (end 00:36 <= 00:50) -> DROPPED; 58's window survived batch 1
    #   (end 00:59 > 00:50) -> merged late (n=2); 120 is new
    f0 = rows(*range(0, 61))
    f1 = rows(30, 90)
    f2 = rows(35, 58, 120)
    files = [f0, f1, f2]

    aggs = [F.count(F.lit(1)).alias("n")]
    emitted, boundary, wms = run_rollup_multi_batch(
        spark,
        files,
        str(tmp_path / "mb"),
        "1 minute",
        aggs=aggs,
        keys=["user"],
    )

    # (a) the watermark trail is the predicted pure function of the data
    assert wms == [
        dt.datetime(1970, 1, 1),
        t0 + dt.timedelta(minutes=50),
        t0 + dt.timedelta(minutes=80),
    ], wms

    # (b) predicted drop set: row in file i is dropped iff its window
    # was evicted by an earlier batch — window end <= wm of batch i-1
    all_rows = f0.unionByName(f1).unionByName(f2)
    dropped, kept = [], []
    for i, f in enumerate(files):
        wend = F.window("ts", "1 minute")["end"]
        prev_wm = wms[i - 1] if i > 0 else dt.datetime(1970, 1, 1)
        dropped.append(f.filter(wend <= F.lit(prev_wm)))
        kept.append(f.filter(~(wend <= F.lit(prev_wm))))
    n_dropped = sum(d.count() for d in dropped)
    assert n_dropped == 1, n_dropped  # minute 35 in file 2
    non_dropped = kept[0].unionByName(kept[1]).unionByName(kept[2])

    # (c) exact accounting: emitted ∪ tail(non-dropped) == batch(non-dropped)
    full = window_rollup(non_dropped, "1 minute", aggs=aggs, keys=["user"])
    tail = full.filter(F.col("window_end") > F.lit(boundary))
    got = (
        emitted.unionByName(tail)
        .toPandas()
        .sort_values(["user", "window_start"])
        .reset_index(drop=True)
    )
    exp = (
        full.toPandas()
        .sort_values(["user", "window_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)

    # and the drops REALLY fired: the batch answer over ALL rows differs
    # from the emitted table exactly on the dropped windows
    full_all = window_rollup(all_rows, "1 minute", aggs=aggs, keys=["user"])
    em = {
        (r["user"], r["window_start"]): r["n"]
        for _, r in emitted.toPandas().iterrows()
    }
    fa = {
        (r["user"], r["window_start"]): r["n"]
        for _, r in full_all.toPandas().iterrows()
    }
    m35 = ("u1", t0 + dt.timedelta(minutes=35))
    assert em[m35] == 1 and fa[m35] == 2  # the dropped late duplicate
    # late-but-mergeable rows were NOT dropped
    m30 = ("u1", t0 + dt.timedelta(minutes=30))
    m58 = ("u1", t0 + dt.timedelta(minutes=58))
    assert em[m30] == 2 and em[m58] == 2


def test_sessionizer_multi_batch_late_rows_accounted(spark, tmp_path):
    """Same hard case for the stateful sessionizer: a late row whose
    session state was evicted by an earlier batch is dropped by the
    engine's late filter (previous batch's watermark — see
    run_rollup_multi_batch's docstring); one arriving while its session
    is still held merges. Emitted sessions must equal the event-time-
    closed sessions of the batch sessionize over the NON-dropped rows,
    with the dropped row's absence visible in the session's n_turns."""
    import datetime as dt

    from gmql_spark.operators.session import sessionize
    from gmql_spark.streaming.materialize import (
        stage_files_ordered,
        watermark_trail,
    )
    from gmql_spark.streaming.session_stream import stream_sessionize

    t0 = dt.datetime(2024, 3, 1)

    def rows(*secs):
        return spark.createDataFrame(
            [("c1", t0 + dt.timedelta(seconds=s)) for s in secs],
            "conv_id string, ts timestamp",
        )

    # f0 (b0, filter wm epoch): session A = 0/60/120s; anchor 3600
    # f1 (b1, filter wm = b0's epoch): 90 is late vs b1's OWN wm (00:50)
    #    but the filter lags one batch -> MERGES into still-held A;
    #    3660 extends the anchor session
    # f2 (b2, filter wm = b1's 00:50): 30 -> DROPPED (A already evicted
    #    at b1); 7200 opens a tail session that stays held at stream end
    f0, f1, f2 = rows(0, 60, 120, 3600), rows(90, 3660), rows(30, 7200)
    files = [f0, f1, f2]

    src = str(tmp_path / "sess_mb_src")
    stage_files_ordered(files, src)
    stream = (
        spark.readStream.schema(f0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_sessionize(stream, gap_timeout_s=120.0, watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_mb_ckpt"))
        .trigger(availableNow=True)
        .format("memory")
        .queryName("sess_mb")
        .start()
    )
    q.awaitTermination(300)

    wms = watermark_trail(q, len(files))
    assert wms == [
        dt.datetime(1970, 1, 1),
        t0 + dt.timedelta(seconds=3600 - 600),
        t0 + dt.timedelta(seconds=3660 - 600),
    ], wms

    # predicted drop set: ts <= previous batch's watermark
    kept = []
    n_dropped = 0
    for i, f in enumerate(files):
        prev = wms[i - 1] if i > 0 else dt.datetime(1970, 1, 1)
        n_dropped += f.filter(F.col("ts") <= F.lit(prev)).count()
        kept.append(f.filter(~(F.col("ts") <= F.lit(prev))))
    assert n_dropped == 1  # the 30s row in f2
    non_dropped = kept[0].unionByName(kept[1]).unionByName(kept[2])

    got = {
        (r.session_start, r.session_end, r.n_turns)
        for r in spark.sql("select * from sess_mb").collect()
    }
    # final watermark = max ts - 10 min; sessions whose end+timeout it
    # passed are closed (emitted), the rest held in state
    final_wm = t0 + dt.timedelta(seconds=7200 - 600)
    batch = sessionize(non_dropped, gap_timeout_s=120.0).collect()
    closed = {
        (r.session_start, r.session_end, r.n_turns)
        for r in batch
        if r.session_end + dt.timedelta(seconds=120) < final_wm
    }
    assert got == closed, (got, closed)
    # the drop is visible: session A emitted with 4 turns (0/60/90/120 —
    # the batch-1 late row merged), NOT 5 (the batch-2 row was dropped)
    a = [r for r in got if r[0] == t0]
    assert a and a[0][2] == 4, a
    # and a full-batch run over ALL rows would have counted 5
    all_rows = f0.unionByName(f1).unionByName(f2)
    full = {r.session_start: r.n_turns
            for r in sessionize(all_rows, gap_timeout_s=120.0).collect()}
    assert full[t0] == 5
