"""Gorilla codec: byte-exact round-trips (BASELINE.md gate) — unit,
property (hypothesis), and through the Spark grouped-map path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gmql_spark.compression.gorilla import (
    compress_series,
    decode_timestamps,
    decode_values,
    decompress_series,
    encode_timestamps,
    encode_values,
)


def roundtrip_ts(arr):
    a = np.asarray(arr, dtype=np.int64)
    assert decode_timestamps(encode_timestamps(a), len(a)).tolist() == a.tolist()


def roundtrip_vals(arr):
    a = np.asarray(arr, dtype=np.float64)
    got = decode_values(encode_values(a), len(a))
    assert got.view(np.uint64).tolist() == a.view(np.uint64).tolist()  # bit-exact, NaN-safe


def test_ts_basic():
    roundtrip_ts([])
    roundtrip_ts([1_700_000_000_000_000])
    roundtrip_ts([0, 60_000_000, 120_000_000, 180_000_000])  # constant delta -> dod 0
    roundtrip_ts([0, 1, 3, 100, 1_000_000_000, 1_000_000_001])
    roundtrip_ts([-5_000_000, 0, 5_000_000])


def test_vals_basic():
    roundtrip_vals([])
    roundtrip_vals([3.14])
    roundtrip_vals([1.0, 1.0, 1.0])  # xor == 0 path
    roundtrip_vals([1.0, 1.5, 1.25, 1.375])  # window-reuse path
    roundtrip_vals([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-308, 1e308])


def test_golden_stream_format_stable():
    """Byte-exact golden streams: the on-disk format must not drift when
    the encoder implementation changes (these bytes were produced by the
    original per-element encoder; the chunked/zero-run encoder must
    emit the identical stream)."""
    ts = np.array(
        [1_700_000_000_000_000 + i * 60_000_000 + (i % 7) * 13 for i in range(50)],
        dtype=np.int64,
    )
    vals = np.array(
        [1.0, 1.0, 2.5, 2.5, -3.125, 0.0, float("nan"), 1e300, 1.0000001] * 5 + [42.0] * 5,
        dtype=np.float64,
    )
    assert encode_timestamps(ts).hex() == (
        "00060a24181e4000f000000000393870d06526ad032935681949ab40ca4d5a06"
        "526ad0329356819480"
    )
    assert encode_values(vals).hex() == (
        "3ff00000000000006137ffac084006d80133ffc67df9fc8791000eb3e1fe0e3f"
        "21e496bc383c000000006b5fca6d7ff400000000000060420036c0099ffe33ef"
        "cfe43c8800759f0ff071f90f24b5e1c1e0000000035afe536bffa000000000000"
        "3021001b6004cfff19f7e7f21e44003acf87f838fc87925af0e0f000000001ad"
        "7f29b5ffd0000000000001810800db00267ff8cfbf3f90f22001d67c3fc1c7e4"
        "3c92d78707800000000d6bf94daffe8000000000000c084006d80133ffc67df"
        "9fc8791000eb3e1fe0e3f21e496bc383dfed400006b5fca6c0"
    )


def test_long_zero_runs_roundtrip():
    """Zero-run batching (write_zeros) must round-trip across byte and
    flush boundaries: constant cadence and constant values at lengths
    around the 4096-bit flush threshold."""
    for n in (1, 7, 8, 9, 4095, 4096, 4097, 20_000):
        ts = np.arange(n, dtype=np.int64) * 60_000_000
        roundtrip_ts(ts)
        roundtrip_vals(np.full(n, 17.25))


def test_compression_ratio_on_regular_series():
    """Regular 1-minute cadence must compress far below 8 bytes/point."""
    ts = np.arange(10_000, dtype=np.int64) * 60_000_000 + 1_700_000_000_000_000
    enc = encode_timestamps(ts)
    assert len(enc) < 10_000 * 0.3  # ~1 bit/point for constant cadence


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**52), min_size=0, max_size=120
    )
)
def test_ts_property(xs):
    roundtrip_ts(np.sort(np.asarray(xs, dtype=np.int64)))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64), min_size=0, max_size=120
    )
)
def test_vals_property(xs):
    roundtrip_vals(xs)


def test_spark_roundtrip(spark):
    """rollup tier -> compress_series -> decompress_series == original."""
    from gmql_spark import datagen
    from gmql_spark.operators.rollup import rollup

    sdf = datagen.transcripts_spark(spark, n_conv=40)
    tier = rollup(sdf, "1m").select("conv_id", "window_start", "turn_count")
    tier = tier.withColumn("val", tier["turn_count"].cast("double"))
    packed = compress_series(tier, keys=["conv_id"], ts_col="window_start", value_col="val")
    unpacked = decompress_series(packed, keys=["conv_id"]).toPandas()
    orig = tier.select("conv_id", "window_start", "val").toPandas()
    o = orig.sort_values(["conv_id", "window_start"]).reset_index(drop=True)
    u = (
        unpacked.rename(columns={"value": "val"})
        .sort_values(["conv_id", "window_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(o, u[o.columns], check_dtype=False)
    # compression must beat raw 16 bytes/point on this regular-ish data
    sizes = packed.selectExpr(
        "sum(n_points) as n", "sum(length(ts_bytes) + length(val_bytes)) as b"
    ).collect()[0]
    assert sizes.b < sizes.n * 16


def test_decode_walk_high_entropy_and_edge_classes():
    """The tight-walk decoders (single-grab headers, tolist words) must
    roundtrip streams that exercise every token class densely: random
    walks (full-mantissa xors, '11' headers with nsig up to 64),
    window-reuse '10' runs, 64-bit raw dods (> 2048 jumps), and
    zero-runs crossing word boundaries."""
    import numpy as np

    from gmql_spark.compression.gorilla import (
        decode_timestamps,
        decode_values,
        encode_timestamps,
        encode_values,
    )

    rng = np.random.Generator(np.random.PCG64(9))
    n = 100_000
    vals = np.cumsum(rng.standard_normal(n))
    # splice in repeats (zero-runs) and exact repeats at word-odd offsets
    vals[1000:1300] = vals[999]
    vals[77:80] = vals[76]
    vb = encode_values(vals)
    assert np.array_equal(decode_values(vb, n).view(np.uint64), vals.view(np.uint64))

    # timestamps: mix regular cadence, small jitter, and huge raw dods
    gaps = rng.integers(1, 5_000_000, n)
    gaps[::97] = 60_000_000
    gaps[5000:6000] = 60_000_000  # constant-cadence zero-run
    gaps[::1009] = int(3e13)      # forces the '1111' 64-bit class
    ts = np.cumsum(gaps).astype(np.int64)
    tb = encode_timestamps(ts)
    assert np.array_equal(decode_timestamps(tb, n), ts)


def test_read_series_range_zone_map_prune(spark):
    """Packed rows carry ts_min_us/ts_max_us zone maps; a range read
    must decode only overlapping streams and equal decode-all + filter."""
    import datetime as dt

    from gmql_spark.compression.gorilla import (
        compress_series,
        decompress_series,
        read_series_range,
    )

    # 3 conversations in disjoint hour bands
    rows = []
    for c in range(3):
        base = dt.datetime(2026, 1, 1, 2 * c)
        rows += [
            (f"conv{c}", base + dt.timedelta(minutes=m), float(m)) for m in range(60)
        ]
    df = spark.createDataFrame(rows, "conv_id string, window_start timestamp, val double")
    packed = compress_series(df, keys=["conv_id"], ts_col="window_start", value_col="val").cache()
    assert {"ts_min_us", "ts_max_us"} <= set(packed.columns)

    start, end = dt.datetime(2026, 1, 1, 2), dt.datetime(2026, 1, 1, 2, 30)
    # prune: only conv1's band overlaps [02:00, 02:30)
    lo = int(start.timestamp() * 1e6)
    hi = int(end.timestamp() * 1e6)
    n_pruned = packed.filter(
        (packed.ts_min_us < hi) & (packed.ts_max_us >= lo)
    ).count()
    assert n_pruned == 1

    got = (
        read_series_range(packed, start, end, keys=["conv_id"])
        .toPandas().sort_values(["conv_id", "window_start"]).reset_index(drop=True)
    )
    exp = (
        decompress_series(packed, keys=["conv_id"])
        .filter(f"window_start >= timestamp'{start}' and window_start < timestamp'{end}'")
        .toPandas().sort_values(["conv_id", "window_start"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp)
    assert set(got.conv_id) == {"conv1"} and len(got) == 30
