"""Declarative job-spec runner (serialized-DAG entry point recast)."""

from __future__ import annotations

from gmql_spark import datagen
from gmql_spark.plans.jobspec import compile_spec, run_spec
from gmql_spark.sources.catalog import write_transcripts


def test_spec_pipeline(spark, tmp_path):
    raw = datagen.transcripts_spark(spark, n_conv=30)
    path = str(tmp_path / "fact")
    write_transcripts(raw, path, n_buckets=4, precompute_gaps=True)

    spec = {
        "input": {"path": path},
        "steps": [
            {"op": "select", "where": "role in ('user','assistant')"},
            {"op": "rollup", "tier": "1h"},
            {"op": "gapfill", "tier": "1h"},
        ],
        "output": {"path": str(tmp_path / "out")},
    }
    res = run_spec(spark, spec)
    assert res["rows"] > 0
    got = spark.read.parquet(res["path"])
    assert set(got.columns) >= {"conv_id", "window_start", "turn_count", "is_gap"}

    spec2 = {
        "input": {"path": path, "buckets": [0, 1]},
        "steps": [
            {"op": "project", "keep": ["conv_id", "ts"],
             "exprs": {"start_ts": "ts", "end_ts": "ts + interval 5 minutes"}},
            {"op": "cover", "variant": "accumulation", "keys": ["conv_id"]},
        ],
    }
    df = compile_spec(spark, spec2)
    assert df.count() > 0 and "acc" in df.columns
