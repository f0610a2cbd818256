"""Stateful streaming sessionizer — ``applyInPandasWithState``.

The custom-stateful-operator face of the engine (the reference has no
streaming at all): per-conversation session state (start, last ts, turn
count) lives in the state store; each micro-batch extends or closes
sessions, and event-time timeout (watermark passing last_ts + gap)
flushes idle sessions without new data arriving.

Emission contract (tested for batch equivalence in
``tests/test_streaming_multimodal.py``):
- a session row is emitted when it CLOSES — either a newer event of the
  same key arrives past the gap timeout, or the watermark passes
  last_ts + gap (event-time timeout);
- sessions still open when the stream pauses stay in state (a bounded
  stream therefore emits every batch-computed session except each key's
  last — exactly the rows the batch operator would still consider
  extendable).

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


STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_turns", LongType()),
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
    open_session: tuple[int, int, int] | None,
    timeout_us: int,
) -> tuple[list[tuple[int, int, int]], tuple[int, int, int]]:
    """Merge a batch's sorted event times with the open session state.

    Split the batch at gaps > timeout (vectorized), then interval-merge
    the runs WITH the open session: late events the watermark admits may
    sort before the open session's last_us (or before its start_us), so
    extension takes min/max of the bounds — naive "append at the end"
    would regress last_us and shrink the session for out-of-order
    arrivals. Returns (closed sessions, new open state); every merged
    interval except the newest is closed, since nothing the watermark
    still admits can bridge the >timeout gap to it.
    """
    splits = np.flatnonzero(np.diff(ts_us) > timeout_us) + 1
    runs = np.split(ts_us, splits)
    intervals = [(int(r[0]), int(r[-1]), len(r)) for r in runs]
    if open_session is not None:
        intervals.append(open_session)
    intervals.sort()
    merged: list[tuple[int, int, int]] = []
    for first, last, cnt in intervals:
        if merged and first - merged[-1][1] <= timeout_us:
            s0, l0, c0 = merged[-1]
            merged[-1] = (s0, max(l0, last), c0 + cnt)
        else:
            merged.append((first, last, cnt))
    return merged[:-1], merged[-1]


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
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _emit(key, k, [(start_us, last_us, n)])
            return
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        batch = pd.concat(parts) if len(parts) > 1 else parts[0]
        ts_us = np.sort(
            batch[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        open_session = tuple(state.get) if state.exists else None
        closed, (start_us, last_us, n) = _merge_batch(ts_us, open_session, timeout_us)
        state.update((int(start_us), int(last_us), int(n)))
        # event-time timeout: fire when the watermark passes the point
        # at which the open session can no longer be extended
        state.setTimeoutTimestamp((int(last_us) + timeout_us) // 1000)
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
