"""Drive a real Structured Streaming run and materialize its output.

The streaming twins in ``rollup_stream`` are *builders* (stream in,
stream out); this module is the harness that actually RUNS one: stage
the source to a parquet ingest dir, ``readStream`` it back, apply an
event-time windowed aggregate, and ``foreachBatch``-append the emitted
(watermark-closed) windows to a parquet table — the
``Trigger.AvailableNow`` drain-and-stop pattern, with every emitted row
having genuinely flowed through the streaming engine's stateful
aggregation and sink.

Serving contract (the lambda split, same algebra as
``realtime.serve_realtime``): append mode only emits a window once the
watermark passes its end, so at stream end the final ~watermark-delay
of windows is withheld in state. ``run_rollup_to_table`` returns the
emitted table plus its max ``window_end`` boundary; a caller wanting
the full answer unions a batch recompute of windows PAST the boundary.
That union is exact: all staged data arrives in streaming batch 0
(single staged file, watermark still unset ⇒ nothing is ever dropped
as late), so emitted = every window whose end the final watermark
passed, and any window past the boundary that exists in the data at
all is absent from the emitted set — the two sides partition the
window axis on the boundary.

The reference has no streaming layer at all (spark-streaming is a
declared-but-unused dependency, GMQL-Spark/pom.xml); this is
beyond-parity surface.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_window_rollup(
    stream: DataFrame,
    duration: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    ts: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``operators.window_agg.window_rollup``:
    tumbling event-time window aggregate, append-mode safe (single
    stateful aggregation; null-``ts`` rows dropped — a null event time
    never passes the watermark, so its group would sit in state
    forever).

    Output schema matches the batch twin exactly: keys + window_start +
    window_end + the aliased aggregates.
    """
    win = F.window(ts, duration)
    out = (
        stream.filter(F.col(ts).isNotNull())
        .withWatermark(ts, watermark)
        .groupBy(*keys, win.alias("w"))
        .agg(*aggs)
    )
    return out.select(
        *keys,
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c not in (*keys, "w")],
    )


def run_rollup_to_table(
    spark: SparkSession,
    source: DataFrame,
    work_dir: str,
    duration: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    ts: str = "ts",
    watermark: str = "10 minutes",
    timeout_s: float = 600.0,
) -> tuple[DataFrame, object]:
    """Run ``stream_window_rollup`` over ``source`` for real
    (availableNow) and materialize the emitted windows.

    ``work_dir`` is wiped and reused (staged ingest file + checkpoint +
    output table — a scratch dir, never a data dir). The source is
    staged as ONE file so the run is a deterministic two-batch drain:
    batch 0 ingests everything (watermark unset ⇒ no late drops),
    the final no-data batch advances the watermark to
    ``max(ts) - watermark`` and flushes every closed window through
    ``foreachBatch`` into the parquet table.

    Returns ``(emitted, boundary)``: the emitted table (read back with
    an explicit schema, so an all-withheld run yields an empty frame,
    not an error) and its max ``window_end`` (None when empty). Windows
    with ``window_end > boundary`` are exactly the ones still in state
    — recompute those batch-side for a full answer (see module doc).
    """
    shutil.rmtree(work_dir, ignore_errors=True)
    src_dir = os.path.join(work_dir, "src")
    out_dir = os.path.join(work_dir, "out")
    ckpt_dir = os.path.join(work_dir, "ckpt")
    os.makedirs(out_dir, exist_ok=True)
    source.coalesce(1).write.parquet(src_dir)

    staged = spark.read.parquet(src_dir)
    stream = spark.readStream.schema(staged.schema).parquet(src_dir)
    agg = stream_window_rollup(
        stream, duration, aggs=aggs, keys=keys, ts=ts, watermark=watermark
    )
    out_schema = agg.schema

    q = (
        agg.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt_dir)
        .foreachBatch(lambda b, _id: b.write.mode("append").parquet(out_dir))
        .start()
    )
    q.awaitTermination(int(timeout_s))
    if q.isActive:  # pragma: no cover - drain overran the budget
        q.stop()
        raise TimeoutError(f"availableNow drain exceeded {timeout_s}s")

    emitted = spark.read.schema(out_schema).parquet(out_dir)
    boundary = emitted.agg(F.max("window_end")).first()[0]
    return emitted, boundary
