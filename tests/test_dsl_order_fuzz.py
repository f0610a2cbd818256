"""Adversarial sweep over GSL order-spec parsing (the r6 `_sort_exprs`
bare-alias bug class): every combination of direction / nulls placement
/ expression-valued ordering / backtick quoting is compared against the
directly-constructed PySpark Column — on data WITH nulls and ties, so a
silently-wrong direction or nulls side cannot pass. TOPK scripts are
additionally round-tripped against topk_per_key with the same explicit
Columns (the surface where the r6 bug actually bit)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmql_spark.plans.dsl import _sort_exprs, compile_script


@pytest.fixture(scope="module")
def frame(spark):
    # nulls, ties, negatives; uid is the deterministic tiebreak
    rows = [
        (0, 5.0, "a"), (1, None, "b"), (2, 5.0, "a"), (3, -2.0, None),
        (4, 0.0, "c"), (5, None, "a"), (6, 7.5, "b"), (7, -2.0, "c"),
        (8, 3.25, None), (9, 0.0, "b"),
    ]
    return spark.createDataFrame(rows, "uid long, value double, tag string")


def _expected_col(expr: str, direction: str, nulls: str):
    c = F.expr(expr)
    if direction.lower() == "desc":
        return {"first": c.desc_nulls_first, "last": c.desc_nulls_last}.get(
            nulls, c.desc
        )()
    return {"first": c.asc_nulls_first, "last": c.asc_nulls_last}.get(
        nulls, c.asc
    )()


EXPRS = [
    "value",
    "cast(value as int)",
    "value + uid",
    "abs(value)",
    "coalesce(tag, 'zzz')",
]
DIRS = ["asc", "desc", "ASC", "Desc", "DESC"]
NULLS = ["", "first", "last", "FIRST"]


@pytest.mark.parametrize("expr", EXPRS)
@pytest.mark.parametrize("direction", DIRS)
@pytest.mark.parametrize("nulls", NULLS)
def test_sort_spec_matches_explicit_column(frame, expr, direction, nulls):
    spec = f"{expr} {direction}" + (f" nulls {nulls}" if nulls else "")
    got = frame.orderBy(*_sort_exprs([spec]), F.col("uid").asc()).select("uid")
    exp = frame.orderBy(
        _expected_col(expr, direction, nulls.lower()), F.col("uid").asc()
    ).select("uid")
    assert [r.uid for r in got.collect()] == [r.uid for r in exp.collect()], spec


def test_bare_spec_defaults_ascending(frame):
    got = frame.orderBy(*_sort_exprs(["value"]), "uid").select("uid").collect()
    exp = frame.orderBy(F.col("value").asc(), "uid").select("uid").collect()
    assert [r.uid for r in got] == [r.uid for r in exp]


def test_backtick_quoted_trailing_keyword_is_a_column(spark):
    # a column literally named `desc`: quoting opts out of the keyword
    df = spark.createDataFrame(
        [(0, 3), (1, 1), (2, 2)], "uid long, desc long"
    )
    got = df.orderBy(*_sort_exprs(["`desc`"]), "uid").select("uid").collect()
    assert [r.uid for r in got] == [1, 2, 0]  # ascending by the column
    # unquoted trailing desc after an expression is ALWAYS a direction
    got2 = df.orderBy(*_sort_exprs(["uid desc"])).select("uid").collect()
    assert [r.uid for r in got2] == [2, 1, 0]


@pytest.mark.parametrize(
    "spec",
    [
        "value desc",
        "value desc nulls first",
        "cast(value as int) desc nulls last",
        "value + uid asc nulls first",
        "abs(value) DESC",
    ],
)
def test_topk_script_matches_api(spark, frame, spec):
    from gmql_spark.operators.order import topk_per_key

    m = compile_script(
        spark,
        f"T = TOPK(key: 'tag', by: '{spec}', k: 2) E; MATERIALIZE T;",
        tables={"E": frame},
    ).materialized
    exp = topk_per_key(frame, ["tag"], _sort_exprs([spec]), 2)

    def canon(df):
        return sorted(
            ((r.tag, r.uid) for r in df.select("tag", "uid").collect()),
            key=lambda t: (t[0] is None, t[0] or "", t[1]),
        )

    assert canon(m["T"]) == canon(exp)


def test_topk_direction_actually_flips(spark):
    """The r6 bug shape head-on: a descending TOPK script must return
    the opposite head from the ascending one. Groups have >=4 distinct
    values so the top-2 sets cannot coincide."""
    df = spark.createDataFrame(
        [(g, v, g * 10 + v) for g in (0, 1) for v in (1, 2, 3, 4, 5)],
        "g long, v long, uid long",
    )

    def run(spec):
        m = compile_script(
            spark,
            f"T = TOPK(key: 'g', by: '{spec}', k: 2) D; MATERIALIZE T;",
            tables={"D": df},
        ).materialized
        return sorted((r.g, r.v) for r in m["T"].collect())

    assert run("v desc") == [(0, 4), (0, 5), (1, 4), (1, 5)]
    assert run("v asc") == [(0, 1), (0, 2), (1, 1), (1, 2)]
    assert run("v") == run("v asc")


@pytest.mark.parametrize(
    "spec",
    ["value desc", "value asc nulls last", "cast(value as int) desc nulls first"],
)
def test_order_percent_and_rank_match_api(spark, frame, spec):
    """ORDER's other modes run the same spec parser: percent (TopP) and
    bare rank must both agree with the direct operator given explicit
    Columns."""
    from gmql_spark.operators.order import rank_per_key, top_percent_per_key

    def canon(df):
        cols = [c for c in df.columns]
        return sorted(
            tuple(None if v is None else v for v in r)
            for r in df.select(*cols).collect()
        )

    m = compile_script(
        spark,
        f"P = ORDER(key: 'tag', by: '{spec}', percent: 0.5) E;"
        f"R = ORDER(key: 'tag', by: '{spec}') E;"
        "MATERIALIZE P; MATERIALIZE R;",
        tables={"E": frame},
    ).materialized
    assert canon(m["P"]) == canon(
        top_percent_per_key(frame, ["tag"], _sort_exprs([spec]), 0.5)
    )
    assert canon(m["R"]) == canon(
        rank_per_key(frame, ["tag"], _sort_exprs([spec]))
    )


def test_topg_direction_flips(spark):
    """TOPG through the TOPK statement: the group column joins the
    window partition, so the spec direction decides which row of each
    (key, group) survives when ordering by a DIFFERENT column."""
    from gmql_spark.operators.order import topg_per_key

    df = spark.createDataFrame(
        [(g, grp, v) for g in (0, 1) for grp in ("x", "y") for v in (1, 2, 3)],
        "g long, grp string, v long",
    )

    def run(spec):
        m = compile_script(
            spark,
            f"T = TOPK(key: 'g', group: 'grp', by: '{spec}', k: 1) D; "
            "MATERIALIZE T;",
            tables={"D": df},
        ).materialized
        return sorted((r.g, r.grp, r.v) for r in m["T"].collect())

    desc = run("v desc")
    asc = run("v asc")
    assert desc == [(g, grp, 3) for g in (0, 1) for grp in ("x", "y")]
    assert asc == [(g, grp, 1) for g in (0, 1) for grp in ("x", "y")]
    assert desc == sorted(
        (r.g, r.grp, r.v)
        for r in topg_per_key(
            df, ["g"], ["grp"], _sort_exprs(["v desc"]), 1
        ).collect()
    )
