"""ORDER: per-key ranking and top-k selection.

Recast of GMQL's OrderRD (``IROrderRD`` ``IROperators.scala:240-242``;
``OrderRD.scala:23-168``): the reference collects all sample ids to the
driver, builds a one-partition-per-sample ``IDPartitioner``
(``OrderRD.scala:150-167``) and sorts each partition in memory — a hot
conversation = one giant partition. Here it's a window rank: shuffles
once by key, sorts within partitions via Tungsten sort, and top-k prunes
before any further shuffle. TopP (percent) is ``percent_rank``
(``OrderRD.scala:Top/TopP/TopG`` variants).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rank_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    rank_col: str = "order_pos",
    null_col: str | None = None,
) -> DataFrame:
    """Append a 1-based rank within each key group (GMQL's appended
    ``order`` position column, ``OrderRD.scala:83-86``).

    ``null_col`` reproduces the reference's null-key parity nuance:
    OrderRD SEGREGATES rows whose sort attribute is missing and appends
    them unranked after the sorted rows (``OrderRD.scala:83-86`` — the
    ``sortedParts ++ missing`` concatenation), whereas a plain window
    rank folds nulls into the ordering per the orderBy null placement.
    Pass the sort attribute's column name to match the reference: rows
    with a null value there come back with a NULL ``rank_col`` instead
    of a position. Default (None) keeps the window-native behavior."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    if null_col is None:
        return df.withColumn(rank_col, F.row_number().over(w))
    ranked = (
        df.filter(F.col(null_col).isNotNull())
        .withColumn(rank_col, F.row_number().over(w))
    )
    unranked = df.filter(F.col(null_col).isNull()).withColumn(
        rank_col, F.lit(None).cast("int")
    )
    return ranked.unionByName(unranked)


def topk_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "order_pos",
    null_col: str | None = None,
) -> DataFrame:
    """Top-k rows per key (GMQL ``Top(k)``). With ``null_col`` set, the
    reference's ``sortedParts ++ missing`` + take(k) semantics
    (``OrderRD.scala:83-86``): null-sort-key rows sit after every ranked
    row, so they fill Top(k) slots only when a group has FEWER than k
    ranked rows — still with a NULL position. Their mutual order in the
    reference is partition encounter order (arbitrary); here it is the
    remaining ``order_by`` columns PLUS a row-content hash tiebreak, so
    which null rows fill the slots is deterministic across runs and
    parallelism levels even when the lead order column is all-null for
    them (rows tying on the hash are identical in every hashable
    column, hence interchangeable)."""
    ranked = rank_per_key(df, keys, order_by, rank_col, null_col=null_col)
    if null_col is None:
        return ranked.filter(F.col(rank_col) <= k)
    # xxhash64 rejects map types ANYWHERE in the column (also nested
    # inside struct/array — check the full dtype string); hash those
    # through their JSON rendering instead of dropping them, else two
    # rows differing ONLY in a map column tie on the hash and which one
    # fills the Top(k) slot is arbitrary again (map entry order is the
    # row's construction order — stable for deterministically built
    # frames, which is the determinism this tiebreak promises)
    hashable = [
        F.to_json(F.col(c)) if "map<" in t else F.col(c) for c, t in df.dtypes
    ]
    w_keys = Window.partitionBy(*keys)
    w_null = Window.partitionBy(*keys, F.col(null_col).isNull()).orderBy(
        *order_by, F.xxhash64(*hashable)
    )
    n_ranked = F.count(F.col(null_col)).over(w_keys)  # count() skips nulls
    fill_pos = n_ranked + F.row_number().over(w_null)
    keep = F.when(F.col(rank_col).isNotNull(), F.col(rank_col) <= k).otherwise(
        fill_pos <= k
    )
    # window exprs are not allowed in WHERE: materialize, filter, drop
    return ranked.withColumn("_keep", keep).filter(F.col("_keep")).drop("_keep")


def topg_per_key(
    df: DataFrame,
    keys: Sequence[str],
    group_cols: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "order_pos",
) -> DataFrame:
    """Top-k rows per value-group within each key (GMQL ``TopG(k)``,
    ``OrderRD.scala`` TopG variant / ``IROperators.scala:240-242``): the
    grouping values join the window partition key, so ranking stays one
    shuffled Tungsten sort over (keys ++ groups) — no driver collect
    (the reference's OrderMD group variant sorts on the driver,
    ``OrderMD.scala:54-184``)."""
    return topk_per_key(df, [*keys, *group_cols], order_by, k, rank_col)


def top_percent_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    pct: float,
    rank_col: str = "order_pct",
) -> DataFrame:
    """Top fraction per key (GMQL ``TopP(pct)``)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(rank_col, F.percent_rank().over(w)).filter(F.col(rank_col) <= pct)
