"""Unit tests for the interval-algebra operators with hand-constructed
ground truth (COVER/SUMMIT islands, coordinate projection, range join)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gmql_spark.operators.cover import accumulation, cover, summits
from gmql_spark.operators.join import range_join
from gmql_spark.operators.project import project_intervals

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture()
def intervals(spark):
    # acc profile: [0,10):1  [10,20):2  [20,30):1  [40,50):1
    rows = [(ts(0), ts(20)), (ts(10), ts(30)), (ts(40), ts(50))]
    return spark.createDataFrame(rows, "start_ts timestamp, end_ts timestamp")


def test_accumulation_levels(intervals):
    acc = accumulation(intervals).orderBy("acc_start").collect()
    got = [(r.acc_start, r.acc_end, r.acc) for r in acc]
    assert got == [
        (ts(0), ts(10), 1),
        (ts(10), ts(20), 2),
        (ts(20), ts(30), 1),
        (ts(40), ts(50), 1),
    ]


def test_cover_islands(intervals):
    out = cover(intervals, min_acc=1).orderBy("cover_start").collect()
    got = [(r.cover_start, r.cover_end, r.acc_max) for r in out]
    assert got == [(ts(0), ts(30), 2), (ts(40), ts(50), 1)]
    out2 = cover(intervals, min_acc=2).collect()
    assert [(r.cover_start, r.cover_end, r.acc_max) for r in out2] == [(ts(10), ts(20), 2)]


def test_summits(intervals):
    out = summits(intervals).orderBy("acc_start").collect()
    got = [(r.acc_start, r.acc_end, r.acc) for r in out]
    # the level-2 plateau is the summit of island 1; lone island is its own summit
    assert got == [(ts(10), ts(20), 2), (ts(40), ts(50), 1)]


def test_project_intervals_semantics(spark):
    rows = [(1, ts(10), ts(20)), (2, ts(5), ts(6))]
    df = spark.createDataFrame(rows, "id long, start_ts timestamp, end_ts timestamp")
    out = project_intervals(
        df,
        new_start=F.col("start_ts") - F.expr("interval 10 minutes"),
        new_end=F.col("start_ts"),
        min_ts="2026-01-01 00:00:00",
    ).orderBy("id").collect()
    assert [(r.id, r.start_ts, r.end_ts) for r in out] == [
        (1, ts(0), ts(10)),
        (2, ts(0), ts(5)),  # clamped from -5
    ]


def test_range_join_pairs(spark):
    left = spark.createDataFrame([(1, "a", ts(0)), (2, "a", ts(30))], "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(10, "a", ts(4)), (11, "a", ts(20)), (12, "b", ts(1))],
        "rid long, k string, ts timestamp",
    )
    out = range_join(left, right, keys=["k"], max_distance_s=300.0, left_ts="ts", right_ts="ts")
    pairs = {(r.lid, r.rid) for r in out.collect()}
    assert pairs == {(1, 10)}  # |0-4min|<=5min same key; 20min too far; b wrong key