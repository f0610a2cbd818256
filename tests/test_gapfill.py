"""Gap-fill vs the pandas oracle (dense grid, LOCF, linear interp)."""

from __future__ import annotations

import pytest

from gmql_spark import datagen
from gmql_spark.operators.gapfill import gapfill
from gmql_spark.operators.rollup import rollup
from gmql_spark.oracle.rollup import oracle_gapfill_1m, oracle_rollup
from tests.conftest import assert_pdf_equal


@pytest.fixture(scope="module")
def data(spark):
    pdf = datagen.gen_transcripts(n_conv=80)
    sdf = datagen.transcripts_spark(spark, n_conv=80)
    return pdf, sdf


def test_gapfill_matches_oracle(data):
    pdf, sdf = data
    r1m = rollup(sdf, "1m")
    got = gapfill(r1m, "1m").toPandas()
    exp = oracle_gapfill_1m(oracle_rollup(pdf, "1m"))
    assert (got["is_gap"].sum() > 0) and (~got["is_gap"]).sum() > 0  # both kinds present
    assert_pdf_equal(
        got, exp, ["conv_id", "window_start"], float_cols=("latency_interp",)
    )
