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


def test_cover_jaccard_hand_computed(intervals):
    """GMAP4 Jaccard ratios on the fixture: island [0,30) has
    contributors [0,20) and [10,30) -> union [0,30) (span 30),
    intersection [10,20) (span 10): jaccard_result = 30/30 = 1,
    jaccard_intersect = 10/30. Island [40,50): one contributor,
    both ratios 1."""
    from gmql_spark.operators.cover import cover_jaccard

    out = cover_jaccard(intervals, min_acc=1).orderBy("cover_start").collect()
    got = [
        (r.cover_start, r.n_contrib, r.jaccard_result, r.jaccard_intersect)
        for r in out
    ]
    assert got == [(ts(0), 2, 1.0, 10.0 / 30.0), (ts(40), 1, 1.0, 1.0)]

    # min_acc=2: island [10,20); same two contributors, union [0,30):
    # jaccard_result = 10/30, intersection [10,20) -> 10/30
    out2 = cover_jaccard(intervals, min_acc=2).collect()
    assert [
        (r.cover_start, r.cover_end, r.acc_max, r.n_contrib,
         r.jaccard_result, r.jaccard_intersect)
        for r in out2
    ] == [(ts(10), ts(20), 2, 2, 10.0 / 30.0, 10.0 / 30.0)]

    # disjoint contributors around one island (touching at 20): the
    # intersection is empty -> 0 exactly (the reference zeroes it)
    spark = intervals.sparkSession
    touch = spark.createDataFrame(
        [(ts(0), ts(20)), (ts(20), ts(40))], "start_ts timestamp, end_ts timestamp"
    )
    out3 = cover_jaccard(touch, min_acc=1).collect()
    assert [(r.n_contrib, r.jaccard_result, r.jaccard_intersect) for r in out3] == [
        (2, 1.0, 0.0)
    ]


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


def test_nearest_k_semantics(spark):
    """MinDistance(k): k nearest by |Δt| within the radius, ties by
    right ts, direction filters honored."""
    from gmql_spark.operators.join import nearest_k

    left = spark.createDataFrame(
        [(1, "a", ts(10)), (2, "a", ts(100))], "event_id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("a", ts(4)), ("a", ts(12)), ("a", ts(13)), ("a", ts(95)), ("b", ts(10))],
        "k string, ts timestamp",
    )
    out = nearest_k(left, right, keys=["k"], k=2, max_distance_s=1800.0, left_id="event_id")
    got = [(r.event_id, r.ts_r, r.nn_rank) for r in out.orderBy("event_id", "nn_rank").collect()]
    assert got == [(1, ts(12), 1), (1, ts(13), 2), (2, ts(95), 1)]

    back = nearest_k(
        left, right, keys=["k"], k=2, max_distance_s=1800.0,
        left_id="event_id", direction="backward",
    )
    got_b = [(r.event_id, r.ts_r, r.nn_rank) for r in back.orderBy("event_id", "nn_rank").collect()]
    assert got_b == [(1, ts(4), 1), (2, ts(95), 1)]  # only rights at-or-before


def test_interval_join_builders(spark):
    """RegionBuilder variants (GenometricJoin.scala:345-372): output
    interval construction + owner-bucket dedup (no duplicate pairs even
    when intervals span many buckets)."""
    from gmql_spark.operators.join import interval_join

    # long intervals spanning several 10-min buckets force multi-bucket
    # explosion; the owner-bucket test must still emit each pair once
    lv = spark.createDataFrame(
        [(1, "a", ts(0), ts(60))], "lid long, k string, start_ts timestamp, end_ts timestamp"
    )
    rv = spark.createDataFrame(
        [(9, "a", ts(50), ts(70)), (8, "a", ts(70), ts(80)), (7, "b", ts(0), ts(60))],
        "rid long, k string, start_ts timestamp, end_ts timestamp",
    )
    both = interval_join(lv, rv, keys=["k"], builder="both", bucket_s=600.0)
    assert [(r.lid, r.rid) for r in both.collect()] == [(1, 9)]  # overlap only; exactly once

    inter = interval_join(lv, rv, keys=["k"], builder="intersection", bucket_s=600.0).collect()[0]
    assert (inter.int_start, inter.int_end) == (ts(50), ts(60))
    contig = interval_join(lv, rv, keys=["k"], builder="contig", bucket_s=600.0).collect()[0]
    assert (contig.contig_start, contig.contig_end) == (ts(0), ts(70))

    # distance-extended: [0,60) within 700s of [70,80) -> match appears
    near = interval_join(lv, rv, keys=["k"], max_distance_s=700.0, builder="both", bucket_s=600.0)
    assert {(r.lid, r.rid) for r in near.collect()} == {(1, 9), (1, 8)}

    # left builder + distinct ≙ LEFT_DISTINCT: one row per left interval
    rv2 = spark.createDataFrame(
        [(9, "a", ts(50), ts(70)), (10, "a", ts(55), ts(75))],
        "rid long, k string, start_ts timestamp, end_ts timestamp",
    )
    ld = interval_join(
        lv, rv2.drop("rid"), keys=["k"], builder="left", distinct=True, bucket_s=600.0
    )
    assert ld.count() == 1


def test_topg_per_key(spark):
    from pyspark.sql import functions as F

    from gmql_spark.operators.order import topg_per_key

    df = spark.createDataFrame(
        [(u, g, v) for u in "xy" for g in "pq" for v in range(4)],
        "u string, g string, v long",
    )
    out = topg_per_key(df, ["u"], ["g"], [F.col("v").desc()], 2)
    assert out.count() == 8
    assert out.groupBy("u", "g").count().filter("count != 2").count() == 0
    assert {r.v for r in out.collect()} == {2, 3}


def test_range_join_rejects_non_inner(spark):
    """Outer variants would emit duplicate null-extended rows across the
    exploded buckets — the API must refuse, not silently return inner."""
    df = spark.createDataFrame([(1, "a", ts(0))], "lid long, k string, ts timestamp")
    with pytest.raises(ValueError, match="inner"):
        range_join(df, df, keys=["k"], max_distance_s=60.0, how="left")


def test_temporal_difference_zero_distance_is_exact(spark):
    """max_distance_s=0 means exact-timestamp matching; rows 1µs apart
    must NOT be suppressed (the old clamped bucket made |Δ|<=1µs)."""
    from gmql_spark.operators.difference import temporal_difference

    t = dt.datetime(2026, 1, 1)
    us = dt.timedelta(microseconds=1)
    left = spark.createDataFrame(
        [(1, "a", t), (2, "a", t + us)], "lid long, k string, ts timestamp"
    )
    right = spark.createDataFrame([("a", t)], "k string, ts timestamp")
    kept = {r.lid for r in temporal_difference(left, right, keys=["k"], max_distance_s=0.0).collect()}
    assert kept == {2}  # row at exactly t suppressed; row 1µs later kept

def test_bag_bagd_null_skip_and_order(spark):
    """BAG/BAGD (DefaultRegionsToRegionFactory.scala:127-170): sorted
    comma-joined bag / distinct bag; nulls skipped; all-null group
    renders the empty bag."""
    from gmql_spark.functions.aggregates import bag, bagd

    df = spark.createDataFrame(
        [("g1", "b"), ("g1", "a"), ("g1", "b"), ("g1", None), ("g2", None)],
        "g string, v string",
    )
    out = {
        r.g: (r.b, r.bd)
        for r in df.groupBy("g")
        .agg(bag("v").alias("b"), bagd("v").alias("bd"))
        .collect()
    }
    assert out["g1"] == ("a,b,b", "a,b")
    assert out["g2"] == ("", "")


def test_nearest_k_unbounded_matches_bruteforce(spark):
    """max_distance_s=None searches an unbounded radius via iterative
    doubling (GenometricJoin.scala:284-331 parity): neighbors far beyond
    the initial radius are found, and rows with fewer than k global
    neighbors return what exists. Oracle: brute-force over all pairs."""
    import random

    from gmql_spark.operators.join import nearest_k

    rng = random.Random(11)
    t0 = dt.datetime(2026, 1, 1)
    # key "a": right rows clustered 2-5 DAYS away from the left rows
    # (initial radius is 60 s); key "b": only one right row total
    left_rows, right_rows = [], []
    eid = 0
    for _ in range(25):
        left_rows.append((eid, "a", t0 + dt.timedelta(seconds=rng.uniform(0, 3600))))
        eid += 1
    for _ in range(8):
        right_rows.append(("a", t0 + dt.timedelta(days=rng.uniform(2, 5))))
    left_rows.append((eid, "b", t0)); eid += 1
    left_rows.append((eid, "c", t0)); eid += 1  # no right rows at all
    right_rows.append(("b", t0 + dt.timedelta(days=30)))
    left = spark.createDataFrame(left_rows, "event_id long, k string, ts timestamp")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp")

    out = nearest_k(
        left, right, keys=["k"], k=3, max_distance_s=None,
        left_id="event_id", initial_radius_s=3600.0,
    ).select("event_id", "ts_r", "nn_rank").collect()

    # brute-force oracle
    exp = {}
    for (e, kk, lt) in left_rows:
        cands = sorted(
            (abs((rt - lt).total_seconds()), rt) for (rk, rt) in right_rows if rk == kk
        )[:3]
        exp[e] = [rt for _, rt in cands]
    got = {}
    for r in out:
        got.setdefault(r.event_id, {})[r.nn_rank] = r.ts_r
    for e, exp_list in exp.items():
        got_list = [t for _, t in sorted(got.get(e, {}).items())]
        assert got_list == exp_list, f"event {e}: {got_list} != {exp_list}"


# ------------------------------- DistGreater / condition chains (r4)


def test_range_join_ring(spark):
    """min_distance_s = GMQL DistGreater: STRICT lower bound on |Δt|,
    residual-only (bucket width still from max_distance_s)."""
    left = spark.createDataFrame([(1, "a", ts(60))], "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(10, "a", ts(60)), (11, "a", ts(55)), (12, "a", ts(30)), (13, "a", ts(10)),
         (14, "a", ts(90)), (15, "a", ts(120))],
        "rid long, k string, ts timestamp",
    )
    out = range_join(
        left, right, keys=["k"], max_distance_s=1800.0, min_distance_s=300.0
    )
    pairs = {r.rid for r in out.collect()}
    # ring (5, 30] minutes: 55 (5 min away) is excluded by the STRICT >,
    # 30/90 (30 min) included, 10/120 excluded only if > max; 10 is 50
    # min away -> out; 120 is 60 min away -> out
    assert pairs == {12, 14}


def test_nearest_k_min_distance(spark):
    """Nearest neighbor more than d away (DistGreater before
    MinDistance): the exclusion zone removes closer candidates from
    ranking entirely, bounded and unbounded paths agree."""
    from gmql_spark.operators.join import nearest_k

    left = spark.createDataFrame([(1, "a", ts(100))], "event_id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("a", ts(99)), ("a", ts(103)), ("a", ts(110)), ("a", ts(60))],
        "k string, ts timestamp",
    )
    got = nearest_k(
        left, right, keys=["k"], k=2, max_distance_s=7200.0,
        left_id="event_id", min_distance_s=300.0,
    )
    rows = [(r.ts_r, r.nn_rank) for r in got.orderBy("nn_rank").collect()]
    # 99/103 are within 5 min -> excluded; nearest beyond is 110 then 60
    assert rows == [(ts(110), 1), (ts(60), 2)]

    unb = nearest_k(
        left, right, keys=["k"], k=2, max_distance_s=None,
        left_id="event_id", min_distance_s=300.0, initial_radius_s=60.0,
    )
    rows_u = [(r.ts_r, r.nn_rank) for r in unb.orderBy("nn_rank").collect()]
    assert rows_u == rows


def test_interval_join_min_distance(spark):
    """Interval DistGreater uses the reference's distance calculator
    (min edge distance, negated iff overlap): positive bound = gap
    strictly greater; negative bound admits shallow overlaps."""
    from gmql_spark.operators.join import interval_join

    lv = spark.createDataFrame(
        [(1, "a", ts(0), ts(10))], "lid long, k string, start_ts timestamp, end_ts timestamp"
    )
    rv = spark.createDataFrame(
        [(20, "a", ts(12), ts(14)),   # gap 2 min
         (21, "a", ts(25), ts(30)),   # gap 15 min
         (22, "a", ts(8), ts(12))],   # overlap, edge distance 2 min -> dist -2 min
        "rid long, k string, start_ts timestamp, end_ts timestamp",
    )
    near = interval_join(
        lv, rv, keys=["k"], max_distance_s=3600.0, bucket_s=600.0,
        min_distance_s=300.0,
    )
    assert {r.rid for r in near.collect()} == {21}  # only the 15-min gap
    shallow = interval_join(
        lv, rv, keys=["k"], max_distance_s=3600.0, bucket_s=600.0,
        min_distance_s=-60.0,
    )
    # -1 min bound: gaps (2, 15) pass; overlap dist -2 min < -1 min fails
    assert {r.rid for r in shallow.collect()} == {20, 21}


def test_join_conditions_quadruple(spark):
    """Ordered chain parity with JoinQuadruple: pre conditions restrict
    candidates, min_distance keeps ties at the k-th distance (rank, not
    row_number), post conditions filter the ranked result."""
    from gmql_spark.operators.join import join_conditions

    left = spark.createDataFrame([(1, "a", ts(100))], "event_id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("a", ts(98)), ("a", ts(102)),          # ties at 2 min
         ("a", ts(95)), ("a", ts(110)), ("a", ts(150))],
        "k string, ts timestamp",
    )
    # DistLess(1h) ; MinDistance(1) -> both 2-min ties survive
    out = join_conditions(
        left, right, keys=["k"],
        conditions=[("dist_less", 3600.0), ("min_distance", 1)],
        left_id="event_id",
    )
    assert {r.ts_r for r in out.collect()} == {ts(98), ts(102)}

    # DistGreater(4min) before MinDistance: nearest beyond the zone
    out2 = join_conditions(
        left, right, keys=["k"],
        conditions=[("dist_less", 3600.0), ("dist_greater", 240.0), ("min_distance", 1)],
        left_id="event_id",
    )
    assert {r.ts_r for r in out2.collect()} == {ts(95)}

    # post-phase filter: nearest-2, then only upstream (right before left)
    out3 = join_conditions(
        left, right, keys=["k"],
        conditions=[("dist_less", 3600.0), ("min_distance", 3), "upstream"],
        left_id="event_id",
    )
    assert {r.ts_r for r in out3.collect()} == {ts(98), ts(95)}

    # pure pre-phase ring with direction, no min_distance
    out4 = join_conditions(
        left, right, keys=["k"],
        conditions=[("dist_less", 1800.0), ("dist_greater", 240.0), "upstream"],
        left_id="event_id",
    )
    assert {r.ts_r for r in out4.collect()} == {ts(95)}


def test_join_conditions_validation(spark):
    from gmql_spark.operators.join import join_conditions

    df = spark.createDataFrame([(1, "a", ts(0))], "event_id long, k string, ts timestamp")
    with pytest.raises(ValueError, match="unknown atomic"):
        join_conditions(df, df, keys=["k"], conditions=[("nope", 1)])
    with pytest.raises(ValueError, match="min_distance"):
        join_conditions(
            df, df, keys=["k"],
            conditions=[("dist_less", 1), ("min_distance", 1), ("min_distance", 2)],
        )
    with pytest.raises(ValueError, match="dist_less"):
        join_conditions(df, df, keys=["k"], conditions=[("min_distance", 1)])


def test_interval_join_wildcard_keys(spark):
    """3-valued wildcard dims (GenometricJoin.scala:123 strand
    semantics): '*' on either side matches anything; concrete values
    must be equal. Residual predicate, not an equi key."""
    from gmql_spark.operators.join import interval_join

    lv = spark.createDataFrame(
        [(1, "+", ts(0), ts(10)), (2, "-", ts(0), ts(10)), (3, "*", ts(0), ts(10))],
        "lid long, strand string, start_ts timestamp, end_ts timestamp",
    )
    rv = spark.createDataFrame(
        [(20, "+", ts(5), ts(15)), (21, "*", ts(5), ts(15))],
        "rid long, strand string, start_ts timestamp, end_ts timestamp",
    )
    out = interval_join(lv, rv, keys=[], bucket_s=600.0, wildcard_keys=["strand"])
    pairs = {(r.lid, r.rid) for r in out.collect()}
    # +/+ match, -/+ no, */+ yes; everything matches the '*' right row
    assert pairs == {(1, 20), (3, 20), (1, 21), (2, 21), (3, 21)}
    with pytest.raises(ValueError, match="overlap"):
        interval_join(lv, rv, keys=["strand"], wildcard_keys=["strand"])


def test_strict_csv_ingest(spark, tmp_path):
    """FAILFAST mode dies loudly on a malformed line (BedParser.scala
    contract); quarantine mode splits good/bad in one pass."""
    from gmql_spark.sources.text_ingest import read_transcripts_csv

    good_csv = tmp_path / "good.csv"
    good_csv.write_text(
        "conv_id,turn_idx,role,text,tool,ts\n"
        "c1,0,user,hello,,2026-01-01T00:00:00\n"
        "c1,1,assistant,hi,,2026-01-01T00:00:05\n"
    )
    df = read_transcripts_csv(spark, str(good_csv))
    rows = df.orderBy("turn_idx").collect()
    assert [r.role for r in rows] == ["user", "assistant"]
    assert rows[0].ts is not None and rows[0].turn_idx == 0

    bad_csv = tmp_path / "bad.csv"
    bad_csv.write_text(
        "conv_id,turn_idx,role,text,tool,ts\n"
        "c1,0,user,hello,,2026-01-01T00:00:00\n"
        "c1,NOT_AN_INT,assistant,hi,,2026-01-01T00:00:05\n"
    )
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_transcripts_csv(spark, str(bad_csv)).collect()

    good, bad = read_transcripts_csv(spark, str(bad_csv), mode="quarantine")
    assert good.count() == 1 and good.collect()[0].conv_id == "c1"
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "NOT_AN_INT" in bad_rows[0]._corrupt_record


def test_join_conditions_matches_bruteforce(spark):
    """Randomized chains vs a pure-python evaluator of the reference
    semantics (strict dist bounds, direction ties-inclusive, rank-tie
    MinDistance, ordered pre/post split). One Spark session, several
    deterministic seeds."""
    import random

    from gmql_spark.operators.join import join_conditions

    def brute(lrows, rrows, conds):
        split = next(
            (i for i, c in enumerate(conds) if c[0] == "min_distance"), len(conds)
        )
        pre, post = conds[:split], conds[split + 1 :]
        k = conds[split][1] if split < len(conds) else None

        def ok(c, d_us):
            if c[0] == "dist_less":
                return abs(d_us) < int(c[1] * 1e6)
            if c[0] == "dist_greater":
                return abs(d_us) > int(c[1] * 1e6)
            if c[0] == "upstream":
                return d_us >= 0
            return d_us <= 0

        out = set()
        for eid, kk, lus in lrows:
            cands = [
                (lus - rus) for (rk, rus) in rrows
                if rk == kk and all(ok(c, lus - rus) for c in pre)
            ]
            if k is not None and cands:
                dists = sorted(abs(d) for d in cands)
                kth = dists[min(k, len(dists)) - 1]
                cands = [d for d in cands if abs(d) <= kth]
            for d in cands:
                if all(ok(c, d) for c in post):
                    out.add((eid, d))
        return out

    atoms = [
        ("dist_less", 900.0), ("dist_less", 3000.0), ("dist_greater", 60.0),
        ("dist_greater", 300.0), ("upstream",), ("downstream",),
        ("min_distance", 1), ("min_distance", 2),
    ]
    for seed in (1, 7, 13, 29):
        rng = random.Random(seed)
        lrows = [
            (i, rng.choice("ab"), rng.randrange(0, 7200) * 1_000_000)
            for i in range(40)
        ]
        rrows = [
            (rng.choice("ab"), rng.randrange(0, 7200) * 1_000_000)
            for _ in range(60)
        ]
        # build a valid chain: >=1 pre dist_less, <=1 min_distance
        chain = [("dist_less", rng.choice([900.0, 3000.0]))]
        chain += rng.sample(
            [a for a in atoms if a[0] in ("dist_greater", "upstream", "downstream")],
            rng.randrange(0, 2),
        )
        if rng.random() < 0.7:
            chain.append(("min_distance", rng.choice([1, 2])))
            chain += rng.sample(
                [a for a in atoms if a[0] != "min_distance"], rng.randrange(0, 2)
            )

        left = spark.createDataFrame(
            [(e, k, dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us))
             for e, k, us in lrows],
            "event_id long, k string, ts timestamp",
        )
        right = spark.createDataFrame(
            [(k, dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us))
             for k, us in rrows],
            "k string, ts timestamp",
        )
        got = {
            (r.event_id, int(round(r.distance_s * 1e6)))
            for r in join_conditions(
                left, right, keys=["k"], conditions=chain, left_id="event_id"
            ).collect()
        }
        exp = brute(lrows, rrows, [tuple(c) for c in chain])
        assert got == exp, (seed, chain, got ^ exp)


def test_order_null_key_segregation(spark):
    """OrderRD parity nuance (``OrderRD.scala:83-86``): null sort keys
    are segregated and appended UNRANKED, not ranked into the order."""
    from gmql_spark.operators.order import rank_per_key, topk_per_key

    rows = [
        ("a", 1, 5.0), ("a", 2, None), ("a", 3, 9.0), ("a", 4, None),
        ("b", 5, 1.0), ("c", 6, 2.0), ("c", 7, None), ("c", 8, None),
    ]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    out = rank_per_key(
        df, ["k"], [F.col("v").desc(), F.col("id")], null_col="v"
    ).toPandas().set_index("id")
    assert out.loc[3, "order_pos"] == 1 and out.loc[1, "order_pos"] == 2
    assert out.loc[2, "order_pos"] is None or out.loc[2, "order_pos"] != out.loc[2, "order_pos"]
    assert len(out) == 8  # nulls kept, just unranked

    top = topk_per_key(
        df, ["k"], [F.col("v").desc(), F.col("id")], k=2, null_col="v"
    ).toPandas()
    # group a: >=k ranked rows -> nulls take no slot; group c: only 1
    # ranked row -> the reference's `sortedParts ++ missing` take(k)
    # fills slot 2 with the first missing row (id order tiebreak),
    # still unranked
    assert set(top.id) == {3, 1, 5, 6, 7}
    assert top.set_index("id").loc[7].isna()["order_pos"]

    # the deterministic null-fill tiebreak hashes row content; maps are
    # unhashable for xxhash64 even NESTED in a struct — map-bearing
    # columns (checked on the full dtype string) go through to_json so
    # rows differing only there still hash apart
    nested = spark.createDataFrame(
        [("a", 1, None, ({"x": "1"},), {"m": 1}),
         ("a", 2, None, ({"y": "2"},), {"m": 2})],
        "k string, id long, v double, "
        "meta struct<tags:map<string,string>>, attrs map<string,int>",
    )
    got = topk_per_key(
        nested, ["k"], [F.col("v").desc(), F.col("id")], k=1, null_col="v"
    ).toPandas()
    assert len(got) == 1  # planned + executed without AnalysisException

    # default (window-native) behavior unchanged: nulls are ranked
    plain = rank_per_key(df, ["k"], [F.col("v").desc_nulls_last(), F.col("id")]).toPandas()
    assert plain.order_pos.notna().all()


def test_cover_jaccard_matches_bruteforce_random(spark):
    """Property-style check: cover_jaccard on random interval sets must
    match a pure-python sweep + brute-force contributor scan (several
    seeds, incl. bucket-straddling long intervals)."""
    import random

    from gmql_spark.operators.cover import cover_jaccard

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        iv = []  # raw second offsets (ints) for the brute force
        for _ in range(60):
            s = rng.randrange(0, 5000)
            e = s + rng.randrange(1, 2500)  # up to ~40 min: spans buckets
            iv.append((s, e))
        df = spark.createDataFrame(
            [(ts(s / 60.0), ts(e / 60.0)) for s, e in iv],
            "start_ts timestamp, end_ts timestamp",
        )
        got = {
            (r.cover_start, r.cover_end): (
                r.acc_max, r.n_contrib, r.jaccard_result, r.jaccard_intersect
            )
            for r in cover_jaccard(df, min_acc=2, bucket_s=600.0).collect()
        }

        # brute force: sweep islands, then scan every interval per island
        pts = sorted({t for s, e in iv for t in (s, e)})
        segs = []
        for a, b in zip(pts, pts[1:]):
            acc = sum(1 for s, e in iv if s < b and e > a)
            segs.append((a, b, acc))
        islands, cur = [], None
        for a, b, acc in segs:
            if acc >= 2:
                if cur and cur[1] == a:
                    cur = (cur[0], b, max(cur[2], acc))
                else:
                    if cur:
                        islands.append(cur)
                    cur = (a, b, acc)
            else:
                if cur:
                    islands.append(cur)
                cur = None
        if cur:
            islands.append(cur)
        exp = {}
        for a, b, acc in islands:
            contrib = [(s, e) for s, e in iv if s < b and e > a]
            us, ue = min(s for s, _ in contrib), max(e for _, e in contrib)
            ia, ib = max(s for s, _ in contrib), min(e for _, e in contrib)
            den = float(ue - us)
            jr = (b - a) / den if den else 0.0
            ji = (ib - ia) / den if den and ib > ia else 0.0
            exp[(ts(a / 60.0), ts(b / 60.0))] = (acc, len(contrib), jr, ji)

        assert set(got) == set(exp), f"seed {seed}: island mismatch"
        for key in exp:
            ga, gn, gjr, gji = got[key]
            ea, en, ejr, eji = exp[key]
            assert (ga, gn) == (ea, en), (seed, key)
            assert abs(gjr - ejr) < 1e-12 and abs(gji - eji) < 1e-12, (seed, key)


def test_topk_null_fill_matches_bruteforce(spark):
    """Property-style: topk(null_col=) must equal the reference's
    sortedParts ++ missing take(k) computed in plain python, across
    random group shapes (incl. all-null and empty-ranked groups)."""
    import random

    from gmql_spark.operators.order import topk_per_key

    for seed in (3, 11):
        rng = random.Random(seed)
        rows = []
        rid = 0
        for g in "abcdefgh":
            for _ in range(rng.randrange(0, 6)):
                v = None if rng.random() < 0.45 else round(rng.random() * 100, 2)
                rows.append((g, rid, v))
                rid += 1
        if not rows:
            continue
        df = spark.createDataFrame(rows, "k string, id long, v double")
        k = 2
        got = {
            (r.k, r.id)
            for r in topk_per_key(
                df, ["k"], [F.col("v").desc(), F.col("id")], k=k, null_col="v"
            ).collect()
        }
        exp = set()
        for g in "abcdefgh":
            grp = [r for r in rows if r[0] == g]
            ranked = sorted(
                [r for r in grp if r[2] is not None], key=lambda r: (-r[2], r[1])
            )
            missing = sorted([r for r in grp if r[2] is None], key=lambda r: r[1])
            for r in (ranked + missing)[:k]:
                exp.add((g, r[1]))
        assert got == exp, f"seed {seed}: {got ^ exp}"


def test_cover_jaccard_keyed_matches_per_key_runs(spark, intervals):
    """Keyed path (keys != ()): reachable via the JACCARD DSL op but
    previously untested — both sides of the island×interval overlap
    join descend from the same input df, exactly the shape that can
    trip Spark's ambiguous-self-join resolution. Pin it: a two-key
    frame must give, per key, bit-identical results to a keyless run
    over that key's subset, with no cross-key contamination."""
    from gmql_spark.operators.cover import cover_jaccard

    a = intervals.withColumn("grp", F.lit("a"))
    # key b: shifted copy + an extra interval so the two keys differ
    b = (
        intervals.select(
            (F.col("start_ts") + F.expr("INTERVAL 7 MINUTES")).alias("start_ts"),
            (F.col("end_ts") + F.expr("INTERVAL 7 MINUTES")).alias("end_ts"),
        )
        .unionByName(
            spark.createDataFrame(
                [(ts(100), ts(130))], "start_ts timestamp, end_ts timestamp"
            )
        )
        .withColumn("grp", F.lit("b"))
    )
    both = a.unionByName(b)

    got = cover_jaccard(both, min_acc=1, keys=("grp",)).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r.grp, []).append(
            (r.cover_start, r.cover_end, r.acc_max, r.n_contrib,
             r.jaccard_result, r.jaccard_intersect)
        )

    for key, src in (("a", a), ("b", b)):
        exp = [
            (r.cover_start, r.cover_end, r.acc_max, r.n_contrib,
             r.jaccard_result, r.jaccard_intersect)
            for r in cover_jaccard(src.drop("grp"), min_acc=1).collect()
        ]
        assert sorted(by_key[key]) == sorted(exp), f"key {key} diverges"
    assert set(by_key) == {"a", "b"}


def test_prefix_scan_offsets_two_level(spark):
    """The keyless sweep's exclusive prefix scan must equal a numpy
    cumsum across super-bucket boundaries — group < #buckets exercises
    both levels (partitioned window within supers + array scan over the
    per-super totals), keeping the quadratic single-row scan bounded at
    #buckets/group elements."""
    import numpy as np

    from gmql_spark.operators.cover import _prefix_scan_offsets

    rng = np.random.default_rng(11)
    pids = sorted(rng.choice(5000, size=200, replace=False).tolist())
    tot = rng.integers(1, 40, size=200).tolist()
    df = spark.createDataFrame(list(zip(pids, tot)), "_pid long, _ptotal long")
    exp = dict(zip(pids, np.concatenate([[0], np.cumsum(tot)[:-1]]).tolist()))
    for g in (7, 64, 4096):
        got = {
            r._pid: r._offset
            for r in _prefix_scan_offsets(df, "bigint", group=g).collect()
        }
        assert got == exp, g


def test_fused_keyless_sweeps_match_python_across_sweep_buckets(spark):
    """Differential guard for the r7 FUSED keyless sweeps (staged
    accumulation with combined offset+lead side-frame; islands with the
    provisional-flag per-bucket correction): a tiny sweep_bucket_s
    forces dozens of sweep buckets — empty buckets, islands crossing
    bucket boundaries, buckets whose first segment continues the
    previous bucket's island — and everything must match a pure-python
    single-threaded sweep exactly."""
    import random

    from gmql_spark.operators.cover import accumulation, cover, summits

    for seed in (3, 11, 77):
        rng = random.Random(seed)
        iv = []
        for _ in range(80):
            s = rng.randrange(0, 4000)
            e = s + rng.randrange(1, 900)
            iv.append((s, e))
        df = spark.createDataFrame(
            [(ts(s / 60.0), ts(e / 60.0)) for s, e in iv],
            "start_ts timestamp, end_ts timestamp",
        )
        # 60 s sweep buckets over a ~4900 s span: ~80 buckets
        kw = dict(sweep_bucket_s=60.0)

        # pure-python reference sweep
        pts = sorted({t for s, e in iv for t in (s, e)})
        segs = []
        for a, b in zip(pts, pts[1:]):
            acc = sum(1 for s, e in iv if s < b and e > a)
            if acc > 0:
                segs.append((a, b, acc))
        # merge adjacent equal-acc runs (accumulation merges via per_t
        # delta!=0 filtering — equal-acc adjacent runs only arise when a
        # zero-net-delta instant was removed)
        merged = []
        for a, b, acc in segs:
            if merged and merged[-1][1] == a and merged[-1][2] == acc:
                merged[-1] = (merged[-1][0], b, acc)
            else:
                merged.append((a, b, acc))
        exp_acc = {(ts(a / 60.0), ts(b / 60.0), acc) for a, b, acc in merged}
        got_acc = {
            (r.acc_start, r.acc_end, r.acc)
            for r in accumulation(df, **kw).collect()
        }
        assert got_acc == exp_acc, f"seed {seed}: accumulation diverged"

        # islands at min_acc=2 (sessionize adjacent in-range segments)
        in_range = [(a, b, acc) for a, b, acc in merged if acc >= 2]
        exp_islands = []
        for a, b, acc in in_range:
            if exp_islands and exp_islands[-1][1] == a:
                exp_islands[-1] = (
                    exp_islands[-1][0], b, max(exp_islands[-1][2], acc)
                )
            else:
                exp_islands.append((a, b, acc))
        exp_cov = {
            (ts(a / 60.0), ts(b / 60.0), m) for a, b, m in exp_islands
        }
        got_cov = {
            (r.cover_start, r.cover_end, r.acc_max)
            for r in cover(df, min_acc=2, **kw).collect()
        }
        assert got_cov == exp_cov, f"seed {seed}: cover islands diverged"

        # summits: acc > left-adjacent, >= right-adjacent
        exp_sum = set()
        for i, (a, b, acc) in enumerate(merged):
            left = merged[i - 1][2] if i > 0 and merged[i - 1][1] == a else 0
            right = (
                merged[i + 1][2]
                if i + 1 < len(merged) and merged[i + 1][0] == b
                else 0
            )
            if acc > left and acc >= right:
                exp_sum.add((ts(a / 60.0), ts(b / 60.0), acc))
        got_sum = {
            (r.acc_start, r.acc_end, r.acc)
            for r in summits(df, **kw).collect()
        }
        assert got_sum == exp_sum, f"seed {seed}: summits diverged"
