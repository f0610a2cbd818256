"""Differential tests for the r8 vectorized Arrow dot-fold paths in
``operators.similarity``: every replaced higher-order-function (HOF)
formulation is rebuilt inline here and compared BIT-EXACTLY against the
new Arrow twin — buckets/cells must match as integers, sims as raw
float64 bit patterns (the gates hash them)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gmql_spark.operators.similarity import (
    _arrow_pair_sim,
    _assign_cells_np,
    _dot,
    _lit_arr,
    _with_lsh_buckets,
    cosine_topk,
)


@pytest.fixture(scope="module")
def spark():
    from gmql_spark.session import get_spark

    return get_spark(4, app_name="test-similarity-arrow", shuffle_partitions=8)


def _vec_df(spark, n=200, d=13, seed=5, with_null_row=True, with_nan=True):
    rng = np.random.Generator(np.random.PCG64(seed))
    V = rng.standard_normal((n, d)).astype(np.float32)
    rows = [(i, [float(x) for x in V[i]]) for i in range(n)]
    if with_nan:
        rows[3] = (3, [float("nan")] + rows[3][1][1:])
    if with_null_row:
        rows[7] = (7, None)
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), V


def _hof_buckets(frame, vc, planes):
    """The pre-r8 HOF bucket formulation (broadcast planes table +
    zip_with/aggregate fold), verbatim from r3–r7."""
    spark = frame.sparkSession
    rows = [
        (t, [[float(x) for x in pl] for pl in planes[t]])
        for t in range(planes.shape[0])
    ]
    pf = spark.createDataFrame(
        rows, "table int, _planes array<array<double>>"
    ).withColumn("_one", F.pmod(F.xxhash64("table"), F.lit(1)))
    bucket = F.expr(
        f"""aggregate(
              transform(_planes, (pl, p) -> shiftleft(cast(
                aggregate(zip_with({vc}, pl,
                          (x, y) -> cast(x as double) * cast(y as double)),
                          cast(0.0 as double), (acc, x) -> acc + x) > 0
                as long), p)),
              cast(0 as long), (acc, x) -> acc + x)"""
    )
    return (
        frame.withColumn("_one", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(1)))
        .join(F.broadcast(pf), on="_one")
        .withColumn("bucket", bucket)
        .drop("_one", "_planes")
    )


def test_lsh_buckets_bit_identical_to_hof(spark):
    df, _ = _vec_df(spark)
    rng = np.random.Generator(np.random.PCG64(11))
    planes = rng.standard_normal((3, 7, 13))
    old = {
        (r["vec_id"], r["table"]): r["bucket"]
        for r in _hof_buckets(df, "embedding", planes).collect()
    }
    new = {
        (r["vec_id"], r["table"]): r["bucket"]
        for r in _with_lsh_buckets(df, "embedding", planes).collect()
    }
    assert set(old) == set(new)
    assert old == new
    # the null-vector row must carry a null bucket on both paths
    assert old[(7, 0)] is None and new[(7, 0)] is None


def test_assign_cells_bit_identical_to_hof(spark):
    df, _ = _vec_df(spark, seed=9)
    rng = np.random.Generator(np.random.PCG64(2))
    cen = rng.standard_normal((6, 13))

    sims = F.array(*[
        _dot(F.col("embedding"), _lit_arr(c))
        / (F.col("_cn") * F.lit(float(np.sqrt(c @ c))))
        for c in cen
    ])
    old = {
        r["vec_id"]: r["cell"]
        for r in (
            df.withColumn("_cn", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))))
            .withColumn("_sims", sims)
            .withColumn(
                "cell",
                F.array_position(F.col("_sims"), F.array_max("_sims")).cast("int"),
            )
            .select("vec_id", "cell")
        ).collect()
    }
    new = {
        r["vec_id"]: r["cell"]
        for r in _assign_cells_np(df, "embedding", cen).select("vec_id", "cell").collect()
    }
    assert old == new
    assert new[7] is None  # null vector → null cell


def test_pair_sim_bit_identical_to_hof(spark):
    a, _ = _vec_df(spark, n=60, seed=3)
    b, _ = _vec_df(spark, n=60, seed=4, with_null_row=False, with_nan=False)
    pairs = a.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_qv")).join(
        b.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_cv")),
        F.col("id_a") != F.col("id_b"),
    )
    qn = F.sqrt(_dot(F.col("_qv"), F.col("_qv")))
    cn = F.sqrt(_dot(F.col("_cv"), F.col("_cv")))
    hof = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in pairs.select(
            "id_a", "id_b",
            (_dot(F.col("_qv"), F.col("_cv")) / (qn * cn)).alias("sim"),
        ).collect()
    }
    new = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in _arrow_pair_sim(pairs, ["id_a", "id_b"], "_qv", "_cv").collect()
    }
    assert set(hof) == set(new)
    for k, v in hof.items():
        w = new[k]
        if v is None or (isinstance(v, float) and np.isnan(v)):
            assert w is None or np.isnan(w), (k, v, w)
            assert (v is None) == (w is None), (k, v, w)
        else:
            assert np.float64(v).tobytes() == np.float64(w).tobytes(), (k, v, w)


def test_cosine_topk_matches_bruteforce_crossjoin(spark):
    """The collected-queries Arrow cosine_topk must equal the old
    crossJoin+HOF plan, rebuilt inline (rank ties decided by raw sims,
    so agreement here implies bit-compatible sims)."""
    from gmql_spark.operators.order import topk_per_key

    df, _ = _vec_df(spark, n=120, seed=6, with_null_row=False, with_nan=False)
    q = df.filter(F.col("vec_id") < 8)
    qf = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv"))
    cf = df.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_cv"))
    qn = F.sqrt(_dot(F.col("_qv"), F.col("_qv")))
    cn = F.sqrt(_dot(F.col("_cv"), F.col("_cv")))
    scored = (
        F.broadcast(qf)
        .crossJoin(cf)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            (_dot(F.col("_qv"), F.col("_cv")) / (qn * cn)).alias("sim"),
        )
    )
    old = topk_per_key(
        scored, keys=["query_id"],
        order_by=[F.col("sim").desc(), F.col("neighbor_id").asc()],
        k=4, rank_col="rank",
    ).select("query_id", "neighbor_id", "rank")
    new = cosine_topk(q, df, k=4)
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))


def test_cosine_topk_rejects_unbounded_query_set(spark):
    import gmql_spark.operators.similarity as sim

    df, _ = _vec_df(spark, n=30, with_null_row=False, with_nan=False)
    orig = sim._MAX_BRUTE_QUERIES
    sim._MAX_BRUTE_QUERIES = 10
    try:
        with pytest.raises(ValueError, match="bounded brute baseline"):
            cosine_topk(df, df, k=2)
    finally:
        sim._MAX_BRUTE_QUERIES = orig
