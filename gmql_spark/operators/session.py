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
    salt_bucket_s: float | None = None,
) -> DataFrame:
    """One row per (key, session): session_start/session_end (first/last
    event ts), n_turns. A session breaks where the gap to the previous
    event exceeds ``gap_timeout_s`` (first event of a key always starts
    one). ``order`` adds tie-break columns after ``ts``.

    Hot-key bound (same contract as ``join.asof_join``): the window puts
    each key's full history in ONE sort partition, so per-key row count
    is the parallelism floor — fine for conversations (bounded turn
    counts), and pinned by a 10⁶-row single-key skew test. For keys
    beyond that, pass ``salt_bucket_s``: the RANGE-SALT path —
    sessionize per (key, time-bucket), then interval-merge ONLY each
    bucket's first/last sessions across buckets (interior sessions are
    already gap-isolated by > timeout on both sides, so only boundary
    sessions can bridge a bucket edge). The merge frame is ≤2 rows per
    non-empty (key, bucket) — session-grain, not row-grain — so the hot
    key's parallelism is its bucket count. Identical output to the
    unsalted path (equality-tested; ``order`` tie-breaks never affect
    session bounds/counts — equal-ts rows always share a session — so
    the salted path safely ignores them). Alternatively the streaming
    sessionizer's state is O(1) per key. Note the salted win assumes
    sessions ≪ rows on the hot key (the boundary-merge frame is
    session-grain); a degenerate every-row-its-own-session key gains
    parallelism in phase 1 but the per-key re-index window is then
    session-grain ≈ row-grain."""
    if salt_bucket_s is not None:
        return _sessionize_salted(df, key, ts, gap_timeout_s, salt_bucket_s)
    timeout_us = int(gap_timeout_s * 1e6)
    order_cols = [F.col(ts).asc(), *[F.col(c).asc() for c in order]]
    return _sessionize_windowed(df, key, ts, timeout_us, order_cols)


def _sessionize_windowed(df, key, ts, timeout_us, order_cols) -> DataFrame:
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


def _sessionize_salted(
    df: DataFrame, key: str, ts: str, gap_timeout_s: float, salt_bucket_s: float
) -> DataFrame:
    """Range-salted sessionize (see ``sessionize``): phase 1 sessionizes
    per (key, time-bucket); phase 2 interval-merges only each bucket's
    FIRST/LAST session across buckets (any interior session has >timeout
    gaps on both sides inside its own bucket, so no cross-bucket bridge
    can reach it — and first/last of the same bucket never merge with
    each other for the same reason); phase 3 re-indexes per key at
    session grain."""
    timeout_us = int(gap_timeout_s * 1e6)
    bucket_us = max(int(salt_bucket_s * 1e6), 1)
    us = F.unix_micros(F.col(ts))
    b = df.withColumn("_tb", F.floor(us / F.lit(bucket_us)).cast("long"))
    w = Window.partitionBy(key, "_tb").orderBy(F.col(ts).asc())
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > timeout_us), F.lit(1)).otherwise(F.lit(0))
    w_cum = Window.partitionBy(key, "_tb").orderBy(F.col(ts).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    loc = (
        b.withColumn("_sess", F.sum(new_sess).over(w_cum))
        .groupBy(key, "_tb", "_sess")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )
    wb = Window.partitionBy(key, "_tb")
    loc = loc.withColumn("_lo", F.min("_sess").over(wb)).withColumn(
        "_hi", F.max("_sess").over(wb)
    )
    bnd = loc.filter((F.col("_sess") == F.col("_lo")) | (F.col("_sess") == F.col("_hi")))
    inner = loc.filter((F.col("_sess") != F.col("_lo")) & (F.col("_sess") != F.col("_hi")))
    # island-merge the boundary sessions per key (session-grain frame,
    # <=2 rows per non-empty bucket)
    s_us = F.unix_micros(F.col("session_start"))
    prev_end = F.lag(F.unix_micros(F.col("session_end"))).over(
        Window.partitionBy(key).orderBy("session_start")
    )
    new_isl = F.when(prev_end.isNull() | (s_us - prev_end > timeout_us), F.lit(1)).otherwise(
        F.lit(0)
    )
    w_ik = Window.partitionBy(key).orderBy("session_start").rowsBetween(
        Window.unboundedPreceding, 0
    )
    merged = (
        bnd.withColumn("_isl", F.sum(new_isl).over(w_ik))
        .groupBy(key, "_isl")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.sum("n_turns").alias("n_turns"),
        )
    )
    allsess = merged.select(key, "session_start", "session_end", "n_turns").unionByName(
        inner.select(key, "session_start", "session_end", "n_turns")
    )
    w_idx = Window.partitionBy(key).orderBy("session_start")
    return allsess.withColumn(
        "session_idx", F.row_number().over(w_idx).cast("long")
    ).select(key, "session_idx", "session_start", "session_end", "n_turns")
