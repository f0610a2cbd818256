"""Sessionization: split each key's event stream into idle-gap sessions.

The interval-island logic of COVER (``GenometricCover.scala:172-218``
merges adjacent segments) applied to point events: a session is a
maximal run of per-key events with inter-event gaps <= ``gap_timeout_s``.
This is the batch counterpart of the stateful streaming sessionizer
(``streaming.session_stream``); both must produce identical closed
sessions (tested).

Plan: one window shuffle per key (lag + running sum of new-session
flags — the same sessionization cumulative-flag trick as
``cover._islands``), then a hash aggregate at session grain.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key: str = "conv_id",
    ts: str = "ts",
    gap_timeout_s: float = 1800.0,
    order: Sequence[str] = (),
) -> DataFrame:
    """One row per (key, session): session_start/session_end (first/last
    event ts), n_turns. A session breaks where the gap to the previous
    event exceeds ``gap_timeout_s`` (first event of a key always starts
    one). ``order`` adds tie-break columns after ``ts``.

    Hot-key bound (same contract as ``join.asof_join``): the window puts
    each key's full history in ONE sort partition, so per-key row count
    is the parallelism floor — fine for conversations (bounded turn
    counts), and pinned by a 10⁶-row single-key skew test. For keys
    beyond that, range-salt by coarse time bucket and stitch boundary
    sessions with a per-(key, bucket) edge frame (the
    ``cover._keyless_neighbors`` pattern), or use the streaming
    sessionizer whose state is O(1) per key."""
    timeout_us = int(gap_timeout_s * 1e6)
    order_cols = [F.col(ts).asc(), *[F.col(c).asc() for c in order]]
    w = Window.partitionBy(key).orderBy(*order_cols)
    us = F.unix_micros(F.col(ts))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > timeout_us), F.lit(1)).otherwise(F.lit(0))
    w_cum = Window.partitionBy(key).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    with_sess = df.withColumn("_sess", F.sum(new_sess).over(w_cum))
    return (
        with_sess.groupBy(key, "_sess")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).alias("n_turns"),
        )
        .select(key, F.col("_sess").alias("session_idx"), "session_start",
                "session_end", "n_turns")
    )
