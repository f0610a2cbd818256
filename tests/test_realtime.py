"""Real-time continuous aggregates: stale materialized tiers + raw tail
must equal the one-shot rollup exactly, and the refresh watermark that
drives the routing must be recorded/advanced correctly."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gmql_spark import datagen
from gmql_spark.incremental import append_transcripts, refresh_tiers
from gmql_spark.operators.rollup import PCT_NAMES, rollup
from gmql_spark.realtime import (
    floor_to_tier,
    read_refresh_watermark,
    realtime_rollup,
    serve_realtime,
)
from tests.conftest import assert_pdf_equal

FLOATS = (*PCT_NAMES, "latency_sum_us")


@pytest.fixture(scope="module")
def split_data(spark):
    raw = datagen.transcripts_spark(spark, n_conv=40)
    lo, hi = raw.agg(F.min("ts"), F.max("ts")).collect()[0]
    cut = lo + (hi - lo) / 2
    b1 = raw.filter(F.col("ts") <= F.lit(cut))
    b2 = raw.filter(F.col("ts") > F.lit(cut))
    assert b1.count() > 0 and b2.count() > 0
    return raw, b1, b2


def _pdf(df, keys=("conv_id", "window_start")):
    return df.toPandas().sort_values(list(keys)).reset_index(drop=True)


def test_floor_to_tier():
    t = dt.datetime(2024, 1, 21, 0, 30, 17)
    assert floor_to_tier(t, "1h") == dt.datetime(2024, 1, 21, 0, 0)
    assert floor_to_tier(t, "1m") == dt.datetime(2024, 1, 21, 0, 30)
    assert floor_to_tier(t, "1d") == dt.datetime(2024, 1, 21)
    # grid-aligned input is its own floor
    assert floor_to_tier(dt.datetime(2024, 1, 21, 5), "1h") == dt.datetime(
        2024, 1, 21, 5
    )


def test_refresh_records_watermark(spark, tmp_path, split_data):
    _, b1, b2 = split_data
    fact, out = str(tmp_path / "fact"), str(tmp_path / "tiers")
    d1 = append_transcripts(spark, b1, fact, n_buckets=4)
    res = refresh_tiers(spark, fact, out, dates=d1)
    exp = b1.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    assert res["watermark_us"] == exp
    assert read_refresh_watermark(out) == exp
    # appending + refreshing later data advances it monotonically
    d2 = append_transcripts(spark, b2, fact, n_buckets=4)
    res2 = refresh_tiers(spark, fact, out, dates=d2)
    assert res2["watermark_us"] > exp
    assert read_refresh_watermark(out) == res2["watermark_us"]


def test_realtime_exact_with_stale_tiers(spark, tmp_path, split_data):
    """Append batch 2 WITHOUT refreshing: the tiers are stale, the
    realtime query (tier rows + raw tail past the recorded watermark)
    must still equal the one-shot rollup bit-for-bit."""
    raw, b1, b2 = split_data
    fact, out = str(tmp_path / "fact_rt"), str(tmp_path / "tiers_rt")
    d1 = append_transcripts(spark, b1, fact, n_buckets=4)
    refresh_tiers(spark, fact, out, dates=d1)
    append_transcripts(spark, b2, fact, n_buckets=4)  # no refresh

    for tier in ("1m", "1h"):
        got = _pdf(realtime_rollup(spark, fact, out, tier=tier))
        exp = _pdf(rollup(raw, tier))
        assert_pdf_equal(
            got, exp[got.columns], ["conv_id", "window_start"], float_cols=FLOATS
        )
        # and the tier actually served rows (the routing isn't a full
        # recompute in disguise)
        wm = read_refresh_watermark(out)
        frozen = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=wm)
        n_served = (
            spark.read.parquet(f"{out}/rollup_{tier}")
            .filter(F.col("window_end") <= F.lit(frozen))
            .count()
        )
        assert n_served > 0
        n_total = len(got)
        assert n_served < n_total  # tail contributed too


def test_realtime_fresh_tiers_grid_aligned_boundary(spark, tmp_path, split_data):
    """Fully refreshed tiers + a frozen boundary exactly on the window
    grid: no window may be double-served or dropped."""
    raw, b1, b2 = split_data
    fact, out = str(tmp_path / "fact_g"), str(tmp_path / "tiers_g")
    d1 = append_transcripts(spark, b1, fact, n_buckets=4)
    refresh_tiers(spark, fact, out, dates=d1)
    d2 = append_transcripts(spark, b2, fact, n_buckets=4)
    refresh_tiers(spark, fact, out, dates=d2)

    wm = read_refresh_watermark(out)
    frozen = floor_to_tier(
        dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=wm), "1h"
    )
    got_df = realtime_rollup(spark, fact, out, tier="1h", frozen_until=frozen)
    # each (conv, window) exactly once
    dup = got_df.groupBy("conv_id", "window_start").count().filter("count > 1")
    assert dup.count() == 0
    got = _pdf(got_df)
    exp = _pdf(rollup(raw, "1h"))
    assert_pdf_equal(
        got, exp[got.columns], ["conv_id", "window_start"], float_cols=FLOATS
    )


def test_realtime_requires_watermark(spark, tmp_path, split_data):
    _, b1, _ = split_data
    fact, out = str(tmp_path / "fact_w"), str(tmp_path / "tiers_w")
    append_transcripts(spark, b1, fact, n_buckets=2)
    with pytest.raises(ValueError, match="watermark"):
        realtime_rollup(spark, fact, out, tier="1h")


def test_serve_realtime_tail_filter_prunes(spark, tmp_path, split_data):
    """The tail read is a plain ts >= literal — it must reach the scan
    as a pushed filter over the bucketed fact table."""
    _, b1, _ = split_data
    fact, out = str(tmp_path / "fact_p"), str(tmp_path / "tiers_p")
    d1 = append_transcripts(spark, b1, fact, n_buckets=4)
    refresh_tiers(spark, fact, out, dates=d1)
    wm = read_refresh_watermark(out)
    frozen = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=wm)
    boundary = floor_to_tier(frozen, "1h")
    tail = spark.read.parquet(fact).filter(F.col("ts") >= F.lit(boundary))
    plan = tail._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(ts" in plan


# ------------------------------------------------- multi-tier stitch

import datetime as _dt

from hypothesis import given, settings
from hypothesis import strategies as st

from gmql_spark.realtime import ceil_to_tier, decompose_range, stitch_range

_EPOCH = _dt.datetime(2024, 1, 1)
_ts_strategy = st.integers(min_value=0, max_value=40 * 86400).map(
    lambda s: _EPOCH + _dt.timedelta(seconds=s)
)
_GRAIN = {"raw": 1, "1m": 60, "1h": 3600, "1d": 86400}


@given(a=_ts_strategy, b=_ts_strategy)
@settings(max_examples=300, deadline=None)
def test_decompose_range_partitions_exactly(a, b):
    start, end = min(a, b), max(a, b)
    segs = decompose_range(start, end)
    if start == end:
        assert segs == []
        return
    # exact partition of [start, end), in order
    assert segs[0][1] == start and segs[-1][2] == end
    for (_, _, e0), (_, s1, _) in zip(segs, segs[1:]):
        assert e0 == s1
    assert len(segs) <= 7
    for tier, s, e in segs:
        assert s < e
        step = _GRAIN[tier]
        if tier != "raw":
            # tier segments aligned to their grain on both ends
            assert int((s - _EPOCH).total_seconds()) % step == 0
            assert int((e - _EPOCH).total_seconds()) % step == 0
        else:
            # raw edges never span a full minute unnecessarily
            assert (e - s).total_seconds() <= 120


@given(a=_ts_strategy)
@settings(max_examples=50, deadline=None)
def test_decompose_aligned_day_range_is_one_segment(a):
    s = _dt.datetime(2024, 1, 10)
    segs = decompose_range(s, s + _dt.timedelta(days=3))
    assert segs == [("1d", s, s + _dt.timedelta(days=3))]


def test_ceil_to_tier():
    assert ceil_to_tier(_dt.datetime(2024, 1, 1, 0, 0, 1), "1m") == _dt.datetime(
        2024, 1, 1, 0, 1
    )
    assert ceil_to_tier(_dt.datetime(2024, 1, 1, 0, 1), "1m") == _dt.datetime(
        2024, 1, 1, 0, 1
    )


@pytest.mark.parametrize(
    "start,end",
    [
        (_dt.datetime(2024, 1, 3, 7, 41, 17), _dt.datetime(2024, 1, 29, 21, 5, 3)),
        (_dt.datetime(2024, 1, 5), _dt.datetime(2024, 1, 9)),  # aligned days
        (_dt.datetime(2024, 1, 5, 3, 0, 10), _dt.datetime(2024, 1, 5, 3, 0, 50)),  # sub-minute
        (_dt.datetime(2024, 1, 5, 3, 10), _dt.datetime(2024, 1, 5, 17, 20)),  # same day
    ],
)
def test_stitch_range_equals_direct(spark, split_data, start, end):
    """Stitched tier aggregate over a misaligned range == direct raw
    aggregate over the same range, for every decomposition shape."""
    from gmql_spark.operators.window_agg import cascade, window_rollup

    raw, _, _ = split_data
    # shift the synthetic span onto the requested window: datagen spans
    # its own dates, so re-anchor raw into Jan 2024
    lo = raw.agg(F.min("ts")).collect()[0][0]
    anchor = _dt.datetime(2024, 1, 1)
    shifted = raw.withColumn(
        "ts", F.timestamp_micros(
            F.unix_micros("ts") - F.lit(int((lo - anchor).total_seconds()) * 1_000_000)
        )
    )

    n = [F.count(F.lit(1)).alias("n")]
    m1 = window_rollup(shifted, "1 minute", aggs=n, keys=["conv_id"])
    h1 = cascade(m1, "1 hour", aggs=[F.sum("n").alias("n")], keys=["conv_id"])
    d1 = cascade(h1, "1 day", aggs=[F.sum("n").alias("n")], keys=["conv_id"])
    got = stitch_range(
        {"1m": m1, "1h": h1, "1d": d1},
        shifted,
        start,
        end,
        keys=["conv_id"],
        raw_aggs=n,
        merge_aggs=[F.sum("n").alias("n")],
    ).toPandas().sort_values("conv_id").reset_index(drop=True)
    exp = (
        shifted.filter((F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end)))
        .groupBy("conv_id")
        .agg(*n)
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp)


def test_stitch_transcripts_materialized(spark, tmp_path, split_data):
    """stitch_transcripts over materialized tiers == one-pass aggregate
    of fact rows in range (ingest-time gap attribution on both sides);
    also runs via the GSL STITCH statement."""
    from gmql_spark.plans.dsl import compile_script
    from gmql_spark.realtime import stitch_transcripts

    raw, b1, b2 = split_data
    fact, out = str(tmp_path / "fact_st"), str(tmp_path / "tiers_st")
    d1 = append_transcripts(spark, b1, fact, n_buckets=4)
    refresh_tiers(spark, fact, out, dates=d1)
    d2 = append_transcripts(spark, b2, fact, n_buckets=4)
    refresh_tiers(spark, fact, out, dates=d2)

    lo, hi = raw.agg(F.min("ts"), F.max("ts")).collect()[0]
    start = (lo + dt.timedelta(hours=3)).replace(second=17, microsecond=0)
    end = (hi - dt.timedelta(hours=5)).replace(second=43, microsecond=0)

    got = (
        stitch_transcripts(spark, fact, out, start, end)
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    fact_rows = spark.read.parquet(fact).filter(
        (F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end))
    )
    exp = (
        fact_rows.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.count("gap_us").alias("latency_cnt"),
            F.sum("gap_us").alias("latency_sum_us"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp[got.columns])

    script = (
        f"S = STITCH(fact: '{fact}', tiers: '{out}', "
        f"start: '{start.isoformat()}', end: '{end.isoformat()}'); MATERIALIZE S;"
    )
    via_gsl = (
        compile_script(spark, script, tables={}).materialized["S"]
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_gsl, got)


def test_stitch_range_empty_and_tiny(spark, split_data):
    """start == end yields zero rows; a range inside one minute hits the
    raw-only path."""
    raw, _, _ = split_data
    t0 = raw.agg(F.min("ts")).collect()[0][0]
    n = [F.count(F.lit(1)).alias("n")]
    out = stitch_range({}, raw, t0, t0, keys=["conv_id"], raw_aggs=n, merge_aggs=n)
    assert out.count() == 0
    segs = decompose_range(t0, t0)
    assert segs == []


# --------------------------------------- watermark soundness (round 4)


def test_realtime_exact_with_late_new_conversation(spark, tmp_path, split_data):
    """A conversation appended AFTER the refresh whose rows lie below
    the refresh-time max event ts (per-conversation ordering allows
    this: it's a brand-new conv). The naive watermark (refresh max)
    would drop its early rows from both branches; the pending-append
    clamp must keep the query exact."""
    from gmql_spark.incremental import pending_append_min_us
    from gmql_spark.realtime import read_refresh_manifest

    raw, _, _ = split_data
    held = raw.select("conv_id").distinct().orderBy("conv_id").limit(1)
    held_id = held.collect()[0][0]
    b_main = raw.filter(F.col("conv_id") != held_id)
    b_late = raw.filter(F.col("conv_id") == held_id)
    fact, out = str(tmp_path / "fact_late"), str(tmp_path / "tiers_late")

    d1 = append_transcripts(spark, b_main, fact, n_buckets=4)
    refresh_tiers(spark, fact, out, dates=d1)
    wm_naive = read_refresh_watermark(out)
    append_transcripts(spark, b_late, fact, n_buckets=4)  # no refresh

    late_min = b_late.agg(F.min(F.unix_micros("ts"))).collect()[0][0]
    assert late_min < wm_naive, "fixture must exercise the unsound case"
    man = read_refresh_manifest(out)
    assert pending_append_min_us(fact, man) == late_min

    for tier in ("1m", "1h"):
        got = _pdf(realtime_rollup(spark, fact, out, tier=tier))
        exp = _pdf(rollup(raw, tier))
        assert_pdf_equal(
            got, exp[got.columns], ["conv_id", "window_start"], float_cols=FLOATS
        )


def test_pending_clamp_releases_after_refresh(spark, tmp_path, split_data):
    """After the late batch IS refreshed, the clamp clears (no pending
    appends past the covered version) and the tier serves again."""
    from gmql_spark.incremental import pending_append_min_us
    from gmql_spark.realtime import read_refresh_manifest

    raw, _, _ = split_data
    held_id = raw.select("conv_id").distinct().orderBy("conv_id").limit(1).collect()[0][0]
    fact, out = str(tmp_path / "fact_rel"), str(tmp_path / "tiers_rel")
    d1 = append_transcripts(spark, raw.filter(F.col("conv_id") != held_id), fact, n_buckets=4)
    refresh_tiers(spark, fact, out, dates=d1)
    d2 = append_transcripts(spark, raw.filter(F.col("conv_id") == held_id), fact, n_buckets=4)
    refresh_tiers(spark, fact, out, dates=d2)

    man = read_refresh_manifest(out)
    assert pending_append_min_us(fact, man) is None
    got = _pdf(realtime_rollup(spark, fact, out, tier="1h"))
    exp = _pdf(rollup(raw, "1h"))
    assert_pdf_equal(
        got, exp[got.columns], ["conv_id", "window_start"], float_cols=FLOATS
    )


def test_partial_date_refresh_keeps_clamp(spark, tmp_path, split_data):
    """An append touching TWO dates, followed by a refresh of only ONE
    of them, must stay pending (per-date coverage): clearing the clamp
    on a single global covered version would silently drop the
    unrefreshed date's rows from realtime serving."""
    from gmql_spark.incremental import pending_append_min_us
    from gmql_spark.realtime import read_refresh_manifest

    raw, _, _ = split_data
    fact, out = str(tmp_path / "fact_pd"), str(tmp_path / "tiers_pd")
    d1 = append_transcripts(spark, raw, fact, n_buckets=4)
    refresh_tiers(spark, fact, out, dates=d1)

    # late batch: a NEW conversation with rows on two distinct dates,
    # both below the recorded watermark
    lo = raw.agg(F.min("ts")).collect()[0][0]
    t_a = lo + dt.timedelta(hours=1)
    t_b = t_a + dt.timedelta(days=1)
    template = raw.limit(1).collect()[0].asDict()
    rows = []
    for i, t in enumerate((t_a, t_b)):
        r = dict(template)
        r.update(conv_id="convLATE", turn_idx=i, ts=t)
        rows.append(tuple(r[c] for c in raw.columns))
    late = spark.createDataFrame(rows, raw.schema)
    d2 = append_transcripts(spark, late, fact, n_buckets=4)
    assert len(d2) == 2

    # refresh ONE of the two touched dates only
    refresh_tiers(spark, fact, out, dates=[d2[0]])
    man = read_refresh_manifest(out)
    pend = pending_append_min_us(fact, man)
    late_min = late.agg(F.min(F.unix_micros("ts"))).collect()[0][0]
    assert pend == late_min, "partially refreshed append must stay pending"

    # and realtime stays exact (tail recomputes from the clamp)
    full = raw.unionByName(late)
    got = _pdf(realtime_rollup(spark, fact, out, tier="1h"))
    exp = _pdf(rollup(full, "1h"))
    assert_pdf_equal(
        got, exp[got.columns], ["conv_id", "window_start"], float_cols=FLOATS
    )

    # refreshing the second date clears it
    refresh_tiers(spark, fact, out, dates=[d2[1]])
    man2 = read_refresh_manifest(out)
    assert pending_append_min_us(fact, man2) is None


def test_stitch_realtime_exact_with_stale_tiers(spark, tmp_path, split_data):
    """stitch over STALE tiers: the default mode trusts tier rows and
    silently misses un-refreshed appends; realtime=True answers the
    range past the (pending-clamped) watermark from raw and stays
    exact."""
    from gmql_spark.realtime import stitch_transcripts

    raw, b1, b2 = split_data
    fact, out = str(tmp_path / "fact_sr"), str(tmp_path / "tiers_sr")
    d1 = append_transcripts(spark, b1, fact, n_buckets=4)
    refresh_tiers(spark, fact, out, dates=d1)
    append_transcripts(spark, b2, fact, n_buckets=4)  # no refresh

    lo, hi = raw.agg(F.min("ts"), F.max("ts")).collect()[0]
    start = (lo + dt.timedelta(hours=2)).replace(second=11, microsecond=0)
    end = (hi - dt.timedelta(minutes=7)).replace(second=43, microsecond=0)

    def pdf(df):
        return df.toPandas().sort_values("conv_id").reset_index(drop=True)

    exp = pdf(
        spark.read.parquet(fact)
        .filter((F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end)))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.count("gap_us").alias("latency_cnt"),
            F.sum("gap_us").alias("latency_sum_us"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
    got_rt = pdf(stitch_transcripts(spark, fact, out, start, end, realtime=True))
    import pandas as pd

    pd.testing.assert_frame_equal(got_rt, exp[got_rt.columns])

    # the trusting default really is wrong on stale tiers (fewer turns)
    got_stale = pdf(stitch_transcripts(spark, fact, out, start, end))
    assert got_stale["turn_count"].sum() < exp["turn_count"].sum()
