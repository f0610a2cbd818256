"""GSL script language: parse errors, phase-2 checks, and end-to-end
equivalence with direct operator calls (the script surface must be sugar
over the same plans, ``Translator.scala:311-393`` recast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmql_spark import datagen
from gmql_spark.plans.dsl import GSLError, compile_script, parse, run_script


@pytest.fixture(scope="module")
def raw(spark):
    return datagen.transcripts_spark(spark, n_conv=40)


def test_parse_shapes():
    stmts = parse(
        """
        # comment
        T = LOAD '/tmp/x';
        U = SELECT(role = 'user') T;
        R = ROLLUP(tier: '1m', key: 'conv_id') U;
        MATERIALIZE R INTO '/tmp/out';
        """
    )
    ops = [s.op for s in stmts]
    assert ops == ["LOAD", "SELECT", "ROLLUP", "MATERIALIZE"]
    assert stmts[2].params == {"tier": "1m", "key": "conv_id"}
    assert stmts[3].into == "/tmp/out"


def test_phase2_errors(spark, raw):
    with pytest.raises(GSLError, match="undefined variable"):
        compile_script(spark, "R = ROLLUP(tier: '1m') NOPE; MATERIALIZE R;")
    with pytest.raises(GSLError, match="takes 2"):
        compile_script(spark, "U = UNION() T; MATERIALIZE U;", tables={"T": raw})
    with pytest.raises(GSLError, match="no MATERIALIZE"):
        compile_script(spark, "U = SELECT(role = 'user') T;", tables={"T": raw})
    with pytest.raises(GSLError, match="unknown operator"):
        compile_script(spark, "U = FROBNICATE() T; MATERIALIZE U;", tables={"T": raw})


def test_script_equals_direct_calls(spark, raw):
    """A select→rollup→cascade script must produce the identical frame
    as composing the operator functions by hand."""
    from gmql_spark.operators.rollup import cascade_rollup, rollup

    script = """
        U = SELECT(role = 'assistant') T;
        R = ROLLUP(tier: '1m') U;
        H = CASCADE(tier: '1h') R;
        MATERIALIZE H;
    """
    compiled = compile_script(spark, script, tables={"T": raw})
    got = compiled.materialized["H"].toPandas()

    exp = cascade_rollup(
        rollup(raw.filter(F.col("role") == "assistant"), "1m"), "1h"
    ).toPandas()
    key = ["conv_id", "window_start"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)


def test_script_two_input_ops_and_run(spark, raw, tmp_path):
    """DIFFERENCE/ASOF/NEAREST/JOIN two-input statements + MATERIALIZE
    INTO round-trip."""
    a = raw.filter(F.col("role") == "user").select(
        "conv_id", "ts", F.monotonically_increasing_id().alias("event_id")
    )
    b = raw.filter(F.col("role") == "assistant").select("conv_id", "ts")
    script = f"""
        D = DIFFERENCE(key: 'conv_id', dist: 5.0) A B;
        N = NEAREST(key: 'conv_id', k: 2, dist: 600.0, id: 'event_id') A B;
        MATERIALIZE D INTO '{tmp_path}/d';
        MATERIALIZE N;
    """
    res = run_script(spark, script, tables={"A": a, "B": b})
    assert set(res) == {"D", "N"} and all(v >= 0 for v in res.values())
    assert spark.read.parquet(f"{tmp_path}/d").count() == res["D"]


def test_script_cover_and_topg(spark, raw):
    script = """
        IV = PROJECT(keep: ['conv_id'], start_ts: 'ts', end_ts: 'ts + interval 300 seconds') T;
        C = COVER(min: 2) IV;
        K = TOPK(key: 'conv_id', group: 'role', by: ['ts desc'], k: 1) T;
        MATERIALIZE C;
        MATERIALIZE K;
    """
    compiled = compile_script(spark, script, tables={"T": raw})
    assert compiled.materialized["C"].columns == ["cover_start", "cover_end", "acc_max"]
    k = compiled.materialized["K"]
    # one row per (conv, role) present
    assert k.groupBy("conv_id", "role").count().filter("count > 1").count() == 0
