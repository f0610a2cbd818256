"""Stateful streaming sessionizer — ``applyInPandasWithState``.

The custom-stateful-operator face of the engine (the reference has no
streaming at all): per-conversation session state lives in the state
store; each micro-batch extends or closes sessions, and event-time
timeout flushes idle sessions without new data arriving.

Emission contract (tested for batch equivalence in
``tests/test_streaming_multimodal.py``):
- a session row is emitted exactly when the event-time watermark passes
  ``session_end + gap`` — the point past which no event the watermark
  still admits could extend or bridge into it. Until then the interval
  stays in state (state holds a LIST of disjoint intervals, not just
  the newest: an interval separated from newer ones by > gap may still
  be extended by a late event the watermark admits, so closing
  all-but-newest eagerly would emit sessions a legitimate late arrival
  later extends — duplicate/shrunken rows under append mode);
- sessions still open when the stream pauses stay in state (a bounded
  stream emits every batch-computed session whose close the final
  watermark has sealed; the rest are held).

All state is integer microseconds; per-batch work is vectorized numpy
over the Arrow batch (no per-row Python).
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

def _out_schema(key: str) -> StructType:
    return StructType(
        [
            StructField(key, StringType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_turns", LongType()),
        ]
    )


# all still-open intervals, parallel arrays sorted by start
STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("lasts", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def _emit(key_col: str, key: str, sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            key_col: [key] * len(sessions),
            "session_start": np.array([s[0] for s in sessions], dtype="datetime64[us]"),
            "session_end": np.array([s[1] for s in sessions], dtype="datetime64[us]"),
            "n_turns": np.array([s[2] for s in sessions], dtype=np.int64),
        }
    )


def _merge_batch(
    ts_us: np.ndarray,
    held: list[tuple[int, int, int]],
    timeout_us: int,
    wm_us: int,
) -> tuple[list[tuple[int, int, int]], list[tuple[int, int, int]]]:
    """Merge a batch's sorted event times with the held open intervals,
    then split on the watermark.

    The batch is run-split at gaps > timeout (vectorized) and
    interval-merged with ALL held intervals: late events the watermark
    admits may sort anywhere relative to held state (extension takes
    min/max of the bounds — naive "append at the end" would regress
    last_us for out-of-order arrivals, and bridging runs must coalesce
    across the held boundary). An interval CLOSES iff
    ``last_us + timeout < wm_us``: any event the watermark still admits
    has ts >= wm_us, whose gap to last_us then exceeds the timeout, so
    nothing can extend or bridge into it. Returns (closed, kept), both
    start-sorted.
    """
    if len(ts_us):
        splits = np.flatnonzero(np.diff(ts_us) > timeout_us) + 1
        runs = np.split(ts_us, splits)
        intervals = [(int(r[0]), int(r[-1]), len(r)) for r in runs]
    else:
        intervals = []
    intervals.extend(held)
    intervals.sort()
    merged: list[tuple[int, int, int]] = []
    for first, last, cnt in intervals:
        if merged and first - merged[-1][1] <= timeout_us:
            s0, l0, c0 = merged[-1]
            merged[-1] = (s0, max(l0, last), c0 + cnt)
        else:
            merged.append((first, last, cnt))
    closed = [iv for iv in merged if iv[1] + timeout_us < wm_us]
    kept = [iv for iv in merged if iv[1] + timeout_us >= wm_us]
    return closed, kept


def stream_sessionize(
    stream: DataFrame,
    gap_timeout_s: float = 1800.0,
    key: str = "conv_id",
    ts: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming counterpart of ``operators.session.sessionize``.
    Output mode must be "append"."""
    timeout_us = int(gap_timeout_s * 1e6)

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key_tuple
        wm_us = state.getCurrentWatermarkMs() * 1000
        held: list[tuple[int, int, int]] = []
        if state.exists:
            starts, lasts, counts = state.get
            held = [tuple(map(int, t)) for t in zip(starts, lasts, counts)]
        if state.hasTimedOut:
            ts_us = np.empty(0, dtype=np.int64)
        else:
            parts = [pdf for pdf in pdfs if len(pdf)]
            if not parts and not held:
                return
            if parts:
                batch = pd.concat(parts) if len(parts) > 1 else parts[0]
                ts_us = np.sort(
                    batch[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
                )
            else:
                ts_us = np.empty(0, dtype=np.int64)
        closed, kept = _merge_batch(ts_us, held, timeout_us, wm_us)
        if kept:
            state.update(
                (
                    [s for s, _, _ in kept],
                    [last for _, last, _ in kept],
                    [c for _, _, c in kept],
                )
            )
            # event-time timeout: fire just past the first point at
            # which some kept interval becomes unextendable. kept =>
            # last + timeout >= wm, so this is always > the current
            # watermark (required by setTimeoutTimestamp), and when it
            # fires that interval is guaranteed to close — progress.
            next_fire_us = min(last for _, last, _ in kept) + timeout_us
            state.setTimeoutTimestamp(next_fire_us // 1000 + 1)
        else:
            state.remove()
        if closed:
            yield _emit(key, k, closed)

    return (
        stream.withWatermark(ts, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=_out_schema(key),
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
