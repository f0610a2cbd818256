"""Deterministic sampling / dataset splitting for training pipelines.

Train/val/test assignment and fractional sampling must be STABLE across
runs, cluster sizes, and row order — so they hash the row id, never use
``rand()`` (non-reproducible across retries/partitionings) and never
sort-and-slice (a global sort at corpus scale, and unstable under
appends). The hash is the engine's portable md5 scheme
(``dedup.hash64`` md5 mode): bit-identical in DuckDB, so the split is
exactly oracle-checkable.

GMQL has no sampling operator at all (its SELECT is predicate-only);
this is pipeline surface beyond the reference, like the dedup family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def split_bucket(id_col: Column, seed: str = "split") -> Column:
    """Stable bucket in [0, 10000) from the id: first 15 hex digits of
    md5(id#seed) as a 60-bit int, mod 10000. Content-independent (ids,
    not text) so near-duplicate documents land independently — dedup
    BEFORE splitting if leakage across splits matters."""
    h = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(f"#{seed}"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(N_BUCKETS))


def deterministic_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by stable id hash.

    ``weights`` are proportions (normalized to 1); boundaries are
    cumulative in the dict's insertion order, quantized to 1/10000 —
    the LAST split absorbs the rounding remainder, so the union is
    exhaustive and splits never overlap or drift between runs."""
    if not weights:
        raise ValueError("weights must name at least one split")
    bad = {k: v for k, v in weights.items() if v < 0}
    if bad:
        raise ValueError(
            f"weights must be non-negative, got {bad} (a negative weight "
            "would shift every boundary and silently empty its split)"
        )
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    b = split_bucket(F.col(id_col), seed)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name] / total
        bound = int(round(cum * N_BUCKETS))
        branch = F.when(b < bound, F.lit(name))
        expr = branch if expr is None else expr.when(b < bound, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def sample_fraction(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Keep a stable ~``fraction`` of rows by id hash (quantized to
    1/10000). Nested samples compose: ``sample_fraction(0.1)`` is a
    superset of ``sample_fraction(0.01)`` at the same seed — the
    standard reproducible-subset property hash thresholds give and
    ``rand()`` cannot."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    bound = int(round(fraction * N_BUCKETS))
    return df.filter(split_bucket(F.col(id_col), seed) < bound)
