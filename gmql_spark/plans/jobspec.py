"""Declarative job specs: JSON pipeline -> DataFrame plan.

The reference's second entry point is a serialized operator DAG
(``GMQLExecuteCommand.scala:221-232`` accepts a base64 DAG and runs it
via ``DAGSerializer.deserializeDAG``). The recast: a JSON/dict spec of
pipeline steps, compiled to a DataFrame by composing the engine's
operator functions — same declarative-job surface, human-readable, and
the whole compiled plan still goes through Catalyst as one query.

Example::

    spec = {
        "input": {"path": "/warehouse/transcripts"},
        "steps": [
            {"op": "select", "where": "role = 'assistant'"},
            {"op": "rollup", "tier": "1m"},
            {"op": "gapfill", "tier": "1m"},
        ],
    }
    df = compile_spec(spark, spec)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _step_select(df: DataFrame, step: dict) -> DataFrame:
    return df.filter(step["where"])


def _step_project(df: DataFrame, step: dict) -> DataFrame:
    cols = [F.expr(e).alias(a) for a, e in step.get("exprs", {}).items()]
    keep = step.get("keep", df.columns)
    return df.select(*keep, *cols)


def _step_rollup(df: DataFrame, step: dict) -> DataFrame:
    from gmql_spark.operators.rollup import rollup

    return rollup(
        df,
        tier=step.get("tier", "1m"),
        key=step.get("key", "conv_id"),
        ts=step.get("ts", "ts"),
        role_values=step.get("role_values", ("user", "assistant", "system", "tool")),
        tool_values=step.get("tool_values"),
    )


def _step_cascade(df: DataFrame, step: dict) -> DataFrame:
    from gmql_spark.operators.rollup import cascade_rollup

    return cascade_rollup(df, step["tier"], key=step.get("key", "conv_id"))


def _step_gapfill(df: DataFrame, step: dict) -> DataFrame:
    from gmql_spark.operators.gapfill import gapfill

    return gapfill(
        df,
        tier=step.get("tier", "1m"),
        key=step.get("key", "conv_id"),
        value_col=step.get("value_col", "turn_count"),
        interp_col=step.get("interp_col", "latency_p50"),
    )


def _step_topk(df: DataFrame, step: dict) -> DataFrame:
    from gmql_spark.operators.order import topk_per_key

    order = [F.expr(e) for e in step["order_by"]]
    return topk_per_key(df, keys=step["keys"], order_by=order, k=step["k"])


def _step_cover(df: DataFrame, step: dict) -> DataFrame:
    from gmql_spark.operators.cover import accumulation, cover, flat_cover, summits

    fns = {"accumulation": accumulation, "cover": cover, "flat": flat_cover, "summits": summits}
    fn = fns[step.get("variant", "cover")]
    kwargs = {k: v for k, v in step.items() if k in ("min_acc", "max_acc", "keys")}
    return fn(df, start_ts=step.get("start_ts", "start_ts"),
              end_ts=step.get("end_ts", "end_ts"), **kwargs)


def _step_compress(df: DataFrame, step: dict) -> DataFrame:
    from gmql_spark.compression.gorilla import compress_series

    return compress_series(
        df,
        keys=step.get("keys", ["conv_id"]),
        ts_col=step.get("ts_col", "window_start"),
        value_col=step["value_col"],
    )


def _step_topg(df: DataFrame, step: dict) -> DataFrame:
    from gmql_spark.operators.order import topg_per_key

    order = [F.expr(e) for e in step["order_by"]]
    return topg_per_key(df, step["keys"], step["group_cols"], order, step["k"])


STEP_OPS = {
    "select": _step_select,
    "project": _step_project,
    "rollup": _step_rollup,
    "cascade": _step_cascade,
    "gapfill": _step_gapfill,
    "topk": _step_topk,
    "topg": _step_topg,
    "cover": _step_cover,
    "compress": _step_compress,
}


def compile_spec(spark: SparkSession, spec: dict) -> DataFrame:
    """Compile a job spec to a (lazy) DataFrame."""
    inp = spec["input"]
    if "path" in inp:
        from gmql_spark.sources.catalog import read_transcripts

        df = read_transcripts(spark, inp["path"], buckets=inp.get("buckets"))
    elif "table" in inp:
        df = spark.table(inp["table"])
    else:
        raise ValueError("spec.input needs 'path' or 'table'")
    for step in spec.get("steps", []):
        op = step.get("op")
        if op not in STEP_OPS:
            raise ValueError(f"unknown op {op!r}; known: {sorted(STEP_OPS)}")
        df = STEP_OPS[op](df, step)
    return df


def run_spec(spark: SparkSession, spec: dict) -> dict:
    """Compile and materialize a spec; returns row count + output path."""
    df = compile_spec(spark, spec)
    out = spec.get("output")
    if out:
        df.write.mode(out.get("mode", "overwrite")).parquet(out["path"])
        n = spark.read.parquet(out["path"]).count()
        return {"rows": n, "path": out["path"]}
    return {"rows": df.count(), "path": None}
