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
    cond = [rb["_bucket"] == ev["_bucket"]] + [rb[k] == ev[k] for k in keys]
    joined = rb.join(ev, cond, "inner").filter(
        (ev[ev_ts] >= rb[ref_start]) & (ev[ev_ts] < rb[ref_end])
    )
    grouped = joined.groupBy(
        *[rb[k] for k in keys], rb[ref_start], rb[ref_end]
    ).agg(F.count(F.lit(1)).alias("n_events"), *aggs)
    agg_names = [c for c in grouped.columns if c not in (*keys, ref_start, ref_end)]
    out = refs.join(grouped, on=[*keys, ref_start, ref_end], how="left")
    return out.withColumn("n_events", F.coalesce(F.col("n_events"), F.lit(0)))
