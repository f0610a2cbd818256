"""Rollup tiers vs the pandas oracle — the per-tier point-match gate
(BASELINE.md: 100% exact match at raw→1m→1h→1d)."""

from __future__ import annotations

import pytest

from gmql_spark import datagen
from gmql_spark.operators.rollup import PCT_NAMES, rollup, rollup_all_tiers
from gmql_spark.oracle.rollup import oracle_rollup
from tests.conftest import assert_pdf_equal

FLOATS = (*PCT_NAMES, "latency_sum_us")


@pytest.fixture(scope="module")
def data(spark):
    pdf = datagen.gen_transcripts(n_conv=120)
    sdf = datagen.transcripts_spark(spark, n_conv=120)
    return pdf, sdf


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_direct_rollup_matches_oracle(data, tier):
    pdf, sdf = data
    got = rollup(sdf, tier).toPandas()
    exp = oracle_rollup(pdf, tier)
    assert_pdf_equal(got, exp, ["conv_id", "window_start"], float_cols=FLOATS)


def test_tier_cascade_matches_direct_and_oracle(data):
    """1h/1d built by cascading 1m (mergeable stats) + exact-from-raw
    percentiles must equal both the direct rollup and the oracle."""
    pdf, sdf = data
    tiers = rollup_all_tiers(sdf)
    for tier in ("1h", "1d"):
        got = tiers[tier].toPandas()
        exp = oracle_rollup(pdf, tier)
        assert_pdf_equal(got, exp, ["conv_id", "window_start"], float_cols=FLOATS)


def test_exact_percentiles_matches_oracle_formula(data):
    """exact_percentiles (rank+lerp hash-agg plan) is bit-identical to
    the oracle's weighted lerp and plans no ObjectHashAggregate."""
    import numpy as np

    from gmql_spark.operators.rollup import exact_percentiles, with_gap_seconds
    from gmql_spark.oracle.rollup import _pct_plain_lerp
    from gmql_spark.plans.inspect import assert_no_object_agg

    pdf, sdf = data
    g = with_gap_seconds(sdf)
    out = exact_percentiles(g, keys=["conv_id"], value="gap_s")
    assert_no_object_agg(out)
    got = out.toPandas().sort_values("conv_id").reset_index(drop=True)

    p = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").copy()
    gaps_us = p.groupby("conv_id")["ts"].diff().dt.total_seconds() * 1e6
    p["gap_s"] = gaps_us.round().astype("float64") / 1e6
    exp_rows = []
    for cid, grp in p.groupby("conv_id"):
        vals = np.sort(grp["gap_s"].dropna().to_numpy())
        exp_rows.append(
            {
                "conv_id": cid,
                "latency_p50": _pct_plain_lerp(vals, 0.50),
                "latency_p95": _pct_plain_lerp(vals, 0.95),
                "latency_p99": _pct_plain_lerp(vals, 0.99),
            }
        )
    import pandas as pd

    exp = pd.DataFrame(exp_rows).sort_values("conv_id").reset_index(drop=True)
    assert_pdf_equal(got, exp, ["conv_id"], float_cols=PCT_NAMES)


def test_generic_counts_map_path(data):
    """counts_map without a known category list (HOF fold) must equal the
    count_if fast path."""
    pdf, sdf = data
    fast = rollup(sdf, "1h", role_values=list(datagen.ROLES), tool_values=list(datagen.TOOL_NAMES))
    generic = rollup(sdf, "1h")
    a = fast.select("conv_id", "window_start", "role_counts", "tool_counts").toPandas()
    b = generic.select("conv_id", "window_start", "role_counts", "tool_counts").toPandas()
    assert_pdf_equal(a, b, ["conv_id", "window_start"])
