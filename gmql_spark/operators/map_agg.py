"""MAP over arbitrary reference intervals (the full GenometricMap).

``operators.rollup`` covers the tumbling-window special case (no join
needed). This is the general form of the reference's MAP
(``GenometricMap71.scala:23-203``): for each *reference interval* ×
matching key, aggregate the events that fall inside it — references with
zero matching events still emit a row with count 0 and null aggregates
(``GenometricMap71.scala:109-120``).

Strategy (vs the reference's hand-built binning):
1. bucketed equi-prefix range join (events bucketed by floor(ts/Δ), ref
   intervals exploded over their covered buckets) — an equi-join +
   residual ``start <= ts < end`` Catalyst can shuffle-hash;
2. aggregate per reference row id;
3. left join back to the references with ``coalesce(n, 0)`` — the
   zero-fill left-outer semantics.

Δ (``bucket_s``) is the analogue of GMQL's BinSize knob
(``BinSize.scala:14``): set it near the typical interval length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def map_intervals(
    refs: DataFrame,
    events: DataFrame,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    ref_start: str = "start_ts",
    ref_end: str = "end_ts",
    ev_ts: str = "ts",
    bucket_s: float = 3600.0,
) -> DataFrame:
    """Aggregate events into reference intervals [ref_start, ref_end).

    ``aggs`` are aggregates over the joined event columns; a
    ``n_events`` count (0 for empty refs) is always included. refs must
    have unique rows per (keys, ref_start, ref_end) — callers with
    duplicate intervals should add a row id first.
    """
    keys = list(keys)
    bucket_us = int(bucket_s * 1e6)
    s_us, e_us = F.unix_micros(F.col(ref_start)), F.unix_micros(F.col(ref_end))
    rb = refs.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (s_us / bucket_us).cast("long"), ((e_us - 1) / bucket_us).cast("long")
            )
        ),
    )
    ev = events.withColumn("_bucket", (F.unix_micros(F.col(ev_ts)) / bucket_us).cast("long"))
    # explicit string aliases: refs/events often share lineage (two
    # filters of the same table), which makes df["col"] refs ambiguous
    rb_a, ev_a = rb.alias("__ref"), ev.alias("__ev")
    r_ = lambda c: F.col(f"__ref.{c}")  # noqa: E731
    e_ = lambda c: F.col(f"__ev.{c}")  # noqa: E731
    cond = [r_("_bucket") == e_("_bucket")] + [r_(k) == e_(k) for k in keys]
    joined = rb_a.join(ev_a, cond, "inner").filter(
        (e_(ev_ts) >= r_(ref_start)) & (e_(ev_ts) < r_(ref_end))
    )
    grouped = joined.groupBy(
        *[r_(k).alias(k) for k in keys],
        r_(ref_start).alias(ref_start),
        r_(ref_end).alias(ref_end),
    ).agg(F.count(F.lit(1)).alias("n_events"), *aggs)
    out = refs.join(grouped, on=[*keys, ref_start, ref_end], how="left")
    return out.withColumn("n_events", F.coalesce(F.col("n_events"), F.lit(0)))
