"""Multimodal columns: images/audio/video as opaque binary + typed
metadata, with Arrow-batched (mapInPandas) decode/feature plumbing.

The Spark-side plumbing (schemas, batching, partitioning, UDF
signatures) is real and tested; the actual media decode is stubbed —
this container has no image/audio libraries — behind
``decoder=`` hooks: the default ``_fake_decode`` is a deterministic
pure-numpy stand-in (dimensions and features derived from the bytes), a
real deployment passes e.g. a PIL/librosa-backed decoder with the same
signature.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "meta struct<width:int, height:int, duration_ms:int, sample_rate:int>"
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: bytes -> pseudo pixel/pcm array.

    REAL DECODE NOT IMPLEMENTED in this environment (no PIL/ffmpeg);
    swap via the ``decoder`` argument of the operators below."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload; real decoder required")
    h = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
    n = 64 + int(h[0])  # pseudo dimensions from content
    rng = np.random.Generator(np.random.PCG64(int.from_bytes(h[:8], "little")))
    return rng.integers(0, 256, size=n, dtype=np.uint8)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder: Callable[[bytes], np.ndarray] = _fake_decode,
) -> DataFrame:
    """payload -> fixed-dim float feature vector, Arrow-batched.

    The batch shape is the real contract: each mapInPandas batch holds
    many rows; decode runs per row inside numpy, features are pooled
    reductions (here: moment pooling over the decoded array)."""

    schema = f"{id_col} long, feature array<float>"

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = decoder(bytes(payload)).astype(np.float64)
                # moment-pool into `dim` buckets (deterministic)
                chunks = np.array_split(arr, dim)
                feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
                ids.append(mid)
            yield pd.DataFrame({id_col: ids, "feature": feats})

    return df.mapInPandas(_featurize, schema=schema)


def probe_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder: Callable[[bytes], np.ndarray] = _fake_decode,
) -> DataFrame:
    """Fill the typed meta struct from the payload (decoded shape)."""
    schema = f"{id_col} long, width int, height int, n_bytes long"

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = decoder(bytes(payload))
                rows.append((mid, int(len(arr) % 256), int(len(arr) // 256 + 1), len(payload)))
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "n_bytes"])

    return df.mapInPandas(_probe, schema=schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame timestamp
    (pure Catalyst explode; the decode of each frame would hang off the
    ``decoder`` hook in a real deployment)."""
    from pyspark.sql import functions as F

    return df.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
    )
