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
