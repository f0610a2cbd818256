"""Dump .explain('formatted') for selected declared queries into
plans/<tag_dir>/<name>_<tag>.txt (the judge-facing before/after plan
artifacts). Also dumps the transcript 1m tier rollup plan under the
pseudo-name ``transcript_rollup_1m`` (bench-only surface, not a declared
query).

Usage: python tools/dump_plans.py <tag> [sf_dir] [query ...]
  tag: e.g. "before" / "after" (suffix of the artifact files)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "gapfill",
    "latency_percentiles",
    "cosine_topk",
    "ann_topk",
    "ivf_trained",
    "percentile_digest_ok",
    "range_stitch",
    "cover_accumulation",
    "cover_jaccard",
    "stream_rollup",
]


def main() -> int:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    names = sys.argv[3:] or DEFAULT_QUERIES

    import __spark_entry__ as entrymod
    from gmql_spark.session import get_spark

    spark = get_spark(8, app_name=f"dump-plans-{tag}", shuffle_partitions=16)
    out_dir = os.path.join(REPO, "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt ({plan.count('Exchange')} Exchange)",
              file=sys.stderr)

    # bench-only surface: the 1m transcript tier
    from gmql_spark.datagen import ROLES, TOOL_NAMES, transcripts_spark
    from gmql_spark.operators.rollup import rollup, with_gap_seconds

    raw = transcripts_spark(spark, n_conv=50)
    raw_g = with_gap_seconds(raw).select(
        "conv_id", "ts", "role", "tool", "gap_us", "gap_s"
    )
    m1 = rollup(raw_g, "1m", with_gaps=False, role_values=list(ROLES),
                tool_values=list(TOOL_NAMES))
    plan = m1._sc._jvm.PythonSQLUtils.explainString(
        m1._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(out_dir, f"transcript_rollup_1m_{tag}.txt"), "w") as f:
        f.write(plan)
    print(f"wrote transcript_rollup_1m_{tag}.txt", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
