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


def test_gapfill_lead_generation_equals_join_formulation(spark):
    """r8 rewrite: gap rows generated from present rows (lead + trailing
    sequence) must be row-identical to the former dense-grid join +
    window formulation — including null value_col rows, null interp
    values mid-series, all-null interp keys, and single-row keys."""
    import datetime as dt

    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from gmql_spark.operators.gapfill import gapfill, window_grid

    t0 = dt.datetime(2024, 3, 1)
    rng = np.random.Generator(np.random.PCG64(7))
    rows = []
    for k, hours in (("a", 30), ("b", 1), ("c", 12)):
        present = sorted(rng.choice(hours, size=max(2, hours // 2), replace=False).tolist()) if hours > 1 else [0]
        for h in present:
            val = None if rng.random() < 0.15 else int(rng.integers(1, 9))
            itp = None if rng.random() < 0.3 or k == "c" else float(rng.random())
            rows.append((k, t0 + dt.timedelta(hours=int(h)), val, itp))
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, turn_count long, latency_p50 double"
    )

    def old_gapfill(rollup_df, tier, key, value_col, interp_col):
        grid = window_grid(rollup_df, tier, key)
        picked = [key, "window_start", value_col] + ([interp_col] if interp_col else [])
        joined = grid.join(rollup_df.select(*picked), on=[key, "window_start"], how="left")
        w_all_prev = (
            Window.partitionBy(key).orderBy("window_start")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        base = joined.select(
            key,
            "window_start",
            F.coalesce(F.col(value_col), F.lit(0)).alias(value_col),
            F.col(value_col).isNull().alias("is_gap"),
            F.last(value_col, ignorenulls=True).over(w_all_prev).alias(f"{value_col}_locf"),
            *([interp_col] if interp_col else []),
        )
        if not interp_col:
            return base
        joined = base
        w_all_next = (
            Window.partitionBy(key).orderBy("window_start")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        ws_s = F.unix_timestamp("window_start")
        known_ts = F.when(F.col(interp_col).isNotNull(), ws_s)
        prev_v = F.last(interp_col, ignorenulls=True).over(w_all_prev)
        prev_t = F.last(known_ts, ignorenulls=True).over(w_all_prev)
        next_v = F.first(interp_col, ignorenulls=True).over(w_all_next)
        next_t = F.first(known_ts, ignorenulls=True).over(w_all_next)
        frac = (ws_s - prev_t).cast("double") / (next_t - prev_t).cast("double")
        interp = (
            F.when(F.col(interp_col).isNotNull(), F.col(interp_col))
            .when(prev_v.isNotNull() & next_v.isNotNull(), prev_v + (next_v - prev_v) * frac)
            .otherwise(F.lit(None).cast("double"))
        )
        return joined.select(
            key, "window_start", value_col, "is_gap", f"{value_col}_locf",
            interp.alias("latency_interp"),
        )

    for interp_col in ("latency_p50", None):
        new = gapfill(df, tier="1h", key="conv_id", value_col="turn_count",
                      interp_col=interp_col).toPandas()
        old = old_gapfill(df, "1h", "conv_id", "turn_count", interp_col).toPandas()
        srt = ["conv_id", "window_start"]
        new = new.sort_values(srt).reset_index(drop=True)
        old = old[new.columns].sort_values(srt).reset_index(drop=True)
        assert len(new) == len(old) > 0, interp_col
        for c in new.columns:
            eq = new[c].eq(old[c]) | (new[c].isna() & old[c].isna())
            assert eq.all(), (interp_col, c, new[~eq][["conv_id", "window_start", c]].head())
