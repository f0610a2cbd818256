"""Physical-plan inspection helpers.

The engine's performance contract is expressed as plan properties, not
vibes: scans must show pushed filters / pruned columns, aggregates must
be hash-based (never ObjectHashAggregate fallback — see
operators.rollup.percentiles_for_tier for why), joins over small dims
must broadcast. These helpers make those properties assertable in tests
and reportable in benchmarks.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def unpartitioned_windows(plan: str) -> list[str]:
    """Window specs with NO partition columns — a single-task global
    sort at scale, banned engine-wide. In the plan string a spec prints
    as ``windowspecdefinition(part..., order ASC/DESC ..., frame)``; if
    the FIRST element already carries a sort direction, the partition
    list is empty."""
    hits = []
    for m in re.finditer(r"windowspecdefinition\(([^()]*?)(?:, specifiedwindowframe\(|\))", plan):
        first = m.group(1).split(", ")[0]
        if " ASC" in first or " DESC" in first:
            hits.append(m.group(0)[:160])
    return hits


def plan_report(df: DataFrame) -> dict:
    """Summarize scale-relevant plan features."""
    plan = physical_plan(df)
    return {
        "exchanges": plan.count("Exchange"),
        "broadcasts": plan.count("BroadcastExchange"),
        "sorts": plan.count("Sort "),
        "object_agg": plan.count("ObjectHashAggregate"),
        "hash_agg": plan.count("HashAggregate"),
        "codegen_spans": plan.count("WholeStageCodegen"),
        "pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
    }


def assert_no_object_agg(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "ObjectHashAggregate" not in plan, (
        "plan contains ObjectHashAggregate (slow sort-based fallback risk):\n" + plan[:2000]
    )
