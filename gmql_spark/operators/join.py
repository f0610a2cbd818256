"""Temporal joins: as-of / nearest-neighbor and bounded range joins.

Recast of GMQL's GenometricJoin (``IRGenometricJoin``
``IROperators.scala:362-369``; ``GenometricJoin.scala:17-431``): the
reference bins both sides, replicates the reference intervals ±maxDistance
(``GenometricJoin.scala:284-331``), equi-joins on (bin, chrom), dedupes by
bin-ownership and applies distance predicates (``:375-386``), with
``MinDistance(k)`` via groupByKey+sort (``:130-151``).

Here:
- ``asof_join`` (= MinDistance(1) with Upstream direction) avoids any
  join: union both streams, one window pass per key carries the most
  recent left/right attributes forward. One shuffle, no replication, no
  skew amplification — the classic scalable merge-asof.
- ``range_join`` (= DistLess) is an equi-prefix bucket join: both sides
  bucketed to floor(ts/Δ), the smaller side exploded to neighbor buckets
  so Catalyst gets an equi-join + residual predicate instead of a
  cartesian range condition (the reference's binning trick, kept because
  it is the right strategy at scale — but expressed declaratively).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts: str = "ts",
    right_cols: Sequence[str] = (),
    direction: str = "backward",
    suffix: str = "_right",
    tolerance_s: float | None = None,
    salt_bucket_s: float | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row at-or-before
    its timestamp (``direction='backward'``; ``'forward'`` = next
    at-or-after). Ties: right row at the exact same ts matches.

    Union-window implementation: no join, one shuffle by key.

    Hot-key bound: the window puts each key's full history in ONE sort
    partition, so the per-key row count is the parallelism floor — fine
    for conversations (bounded turn counts), pathological for a key with
    e.g. 10⁸ rows. Mitigations, in preference order: (a) pre-compute the
    carried value at ingest (``catalog.write_transcripts(
    precompute_gaps=True)`` removes this window from the rollup path
    entirely); (b) pass ``salt_bucket_s``: the RANGE-SALT path — the
    window runs per (key, time-bucket) so a hot key's parallelism is
    its bucket count, and bucket boundaries are stitched with a
    per-(key, bucket) right-edge frame carried across buckets (the
    ``cover._keyless_neighbors`` pattern, keyed). Equality-tested vs
    the unsalted path (right timestamps must be per-key distinct for
    bitwise tie equality) and pinned by a 5×10⁶-row single-key run the
    unsalted window cannot balance.
    """
    if salt_bucket_s is not None:
        return _asof_join_salted(
            left, right, keys, ts, right_cols, direction, suffix,
            tolerance_s, salt_bucket_s,
        )
    u, lcols = _asof_union(left, right, keys, ts, right_cols, suffix)

    if direction == "backward":
        # right rows sort before left rows at equal ts so same-ts matches
        w = Window.partitionBy(*keys).orderBy(F.col(ts).asc(), F.col("_side").asc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
    else:
        w = Window.partitionBy(*keys).orderBy(F.col(ts).desc(), F.col("_side").asc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
    carried = [
        F.last(F.when(F.col("_side") == 0, F.col(f"{c}{suffix}")), ignorenulls=True)
        .over(w)
        .alias(f"{c}{suffix}")
        for c in right_cols
    ]
    match_ts = (
        F.last(F.when(F.col("_side") == 0, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias(f"{ts}{suffix}")
    )
    out = u.select(*lcols, "_side", match_ts, *carried).filter(F.col("_side") == 1).drop("_side")
    if tolerance_s is not None:
        within = (
            F.abs(F.unix_micros(F.col(ts)) - F.unix_micros(F.col(f"{ts}{suffix}")))
            <= int(tolerance_s * 1e6)
        )
        null_right = [F.lit(None).alias(f"{c}{suffix}") for c in (ts, *right_cols)]
        kept = [F.when(within, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}") for c in (ts, *right_cols)]
        out = out.select(*lcols, *kept)
    return out


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    suffix: str,
) -> tuple[DataFrame, list]:
    """The shared as-of preamble: tag sides, suffix right columns,
    null-fill the non-shared columns, union. One definition so the
    salted and unsalted paths (equality-tested against each other)
    cannot silently diverge in schema construction."""
    lcols = left.columns
    tagged_l = left.withColumn("_side", F.lit(1))
    rsel = [F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    tagged_r = right.select(*keys, F.col(ts), *rsel).withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in (*keys, ts):
            tagged_r = tagged_r.withColumn(c, F.lit(None))
    for c in right_cols:
        tagged_l = tagged_l.withColumn(f"{c}{suffix}", F.lit(None))
    return tagged_l.unionByName(tagged_r, allowMissingColumns=True), lcols


def _asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    direction: str,
    suffix: str,
    tolerance_s: float | None,
    salt_bucket_s: float,
) -> DataFrame:
    """Range-salted as-of: the union-window runs per (key, time-bucket)
    — a hot key's rows spread over its buckets instead of one sort
    partition — and each bucket's carry-in is patched from a tiny
    per-(key, bucket) edge frame (one row per non-empty bucket, windowed
    per key: the ``cover._keyless_neighbors`` stitch, keyed).

    Per-COLUMN carry semantics match the unsalted window exactly: the
    unsalted ``last(..., ignorenulls)`` carries EACH right column past
    right rows where that column is null, so the edge frame keeps, per
    column, the value of the latest right row where it is non-null."""
    bucket_us = max(int(salt_bucket_s * 1e6), 1)
    back = direction == "backward"
    u, lcols = _asof_union(left, right, keys, ts, right_cols, suffix)
    us = F.unix_micros(F.col(ts))
    u = u.withColumn("_tb", F.floor(us / F.lit(bucket_us)).cast("long"))

    order = [F.col(ts).asc() if back else F.col(ts).desc(), F.col("_side").asc()]
    w = Window.partitionBy(*keys, "_tb").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried_cols = [f"{ts}{suffix}", *[f"{c}{suffix}" for c in right_cols]]
    src = {f"{ts}{suffix}": F.col(ts), **{f"{c}{suffix}": F.col(f"{c}{suffix}") for c in right_cols}}
    local = u.select(
        *lcols,
        "_side",
        "_tb",
        *[
            F.last(F.when(F.col("_side") == 0, src[cc]), ignorenulls=True)
            .over(w)
            .alias(cc)
            for cc in carried_cols
        ],
    )

    # per-(key, bucket) right edges, one value per carried column: the
    # latest (backward) / earliest (forward) right row where THAT column
    # is non-null (max_by/min_by skip null ordering keys)
    r_b = right.select(
        *keys, F.col(ts), *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    ).withColumn(
        "_tb", F.floor(F.unix_micros(F.col(ts)) / F.lit(bucket_us)).cast("long")
    )
    pick = F.max_by if back else F.min_by
    r_us = F.unix_micros(F.col(ts))
    edge = r_b.groupBy(*keys, "_tb").agg(
        *[
            pick(src[cc], F.when(src[cc].isNotNull(), r_us)).alias(f"_edge_{i}")
            for i, cc in enumerate(carried_cols)
        ]
    )
    spine = u.select(*keys, "_tb").distinct()
    w_sp = Window.partitionBy(*keys).orderBy(
        F.col("_tb").asc() if back else F.col("_tb").desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    carry = spine.join(edge, on=[*keys, "_tb"], how="left").select(
        *keys,
        "_tb",
        *[
            F.last(f"_edge_{i}", ignorenulls=True).over(w_sp).alias(f"_carry_{i}")
            for i in range(len(carried_cols))
        ],
    )
    out = local.filter(F.col("_side") == 1).join(carry, on=[*keys, "_tb"], how="left")
    out = out.select(
        *lcols,
        *[
            F.coalesce(F.col(cc), F.col(f"_carry_{i}")).alias(cc)
            for i, cc in enumerate(carried_cols)
        ],
    )
    if tolerance_s is not None:
        within = (
            F.abs(F.unix_micros(F.col(ts)) - F.unix_micros(F.col(f"{ts}{suffix}")))
            <= int(tolerance_s * 1e6)
        )
        out = out.select(
            *lcols,
            *[F.when(within, F.col(cc)).alias(cc) for cc in carried_cols],
        )
    return out


def nearest_k(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    k: int = 1,
    max_distance_s: float | None = 3600.0,
    left_id: str = "event_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    direction: str = "both",
    suffix: str = "_r",
    initial_radius_s: float = 3600.0,
    min_distance_s: float | None = None,
) -> DataFrame:
    """Top-k nearest right rows per left row by |Δts| — GMQL
    ``MinDistance(k)`` (``GenometricJoin.scala:130-151``: per-ref
    groupByKey + sort over binned candidates). With an explicit
    ``max_distance_s`` the candidates come from one bucketed equi-prefix
    join and the top-k is a per-left-row window rank — fully
    distributed, no driver sort, candidate volume ∝ rows within the
    radius.

    ``max_distance_s=None`` searches an UNBOUNDED radius like the
    reference: iterative radius doubling starting at
    ``initial_radius_s`` — each round is the same bounded bucket join,
    restricted to the left rows that have not yet found k neighbors
    (top-k within radius r is globally correct for a row once it has ≥k
    candidates, since every unseen candidate is farther than r). Rows
    re-joined per round shrink geometrically; the loop is bounded by
    log2(right-span / initial_radius) ≤ ~50 rounds, each a distributed
    job (one small driver count per round for termination).

    ``direction``: ``'both'`` | ``'backward'`` (right at-or-before left,
    GMQL Upstream) | ``'forward'`` (at-or-after, Downstream). Ties on
    |Δts| break by right timestamp ascending (deterministic).

    ``min_distance_s``: GMQL ``DistGreater`` chained before
    ``MinDistance`` (``AtomicCondition.scala:15-19``,
    ``GenometricJoin.scala:246-252``) — candidates must additionally
    satisfy ``|Δts| > min_distance_s`` (STRICT, reference parity), i.e.
    "the k nearest rows that are more than d away". The bucket explode
    is still driven by ``max_distance_s`` alone; the min bound is a pure
    residual predicate.

    Output: left columns + ``<right_ts><suffix>`` + suffixed
    ``right_cols`` + ``distance_s`` (signed: positive = right before
    left) + ``nn_rank`` (1-based).
    """
    if max_distance_s is None:
        return _nearest_k_unbounded(
            left, right, keys, k, left_id, left_ts, right_ts, right_cols,
            direction, suffix, initial_radius_s, min_distance_s,
        )
    bucket_us = max(int(max_distance_s * 1e6), 1)
    lus = F.unix_micros(F.col(left_ts))
    rus = F.unix_micros(F.col(f"{right_ts}{suffix}"))
    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence((lus / bucket_us).cast("long") - 1, (lus / bucket_us).cast("long") + 1)
        ),
    )
    rsel = right.select(
        *keys,
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn("_bucket", (rus / bucket_us).cast("long"))
    signed_us = F.unix_micros(lb[left_ts]) - F.unix_micros(rsel[f"{right_ts}{suffix}"])
    cond = [lb["_bucket"] == rsel["_bucket"]] + [lb[kk] == rsel[kk] for kk in keys]
    cond.append(F.abs(signed_us) <= bucket_us)
    if min_distance_s is not None:
        cond.append(F.abs(signed_us) > int(min_distance_s * 1e6))
    if direction == "backward":
        cond.append(signed_us >= 0)
    elif direction == "forward":
        cond.append(signed_us <= 0)
    joined = lb.join(rsel, cond, "inner").drop("_bucket")
    for kk in keys:  # keep the left copy of each join key only
        joined = joined.drop(rsel[kk])
    dist_us_col = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(f"{right_ts}{suffix}"))
    w = Window.partitionBy(left_id).orderBy(
        F.abs(dist_us_col).asc(), F.col(f"{right_ts}{suffix}").asc()
    )
    return (
        joined.withColumn("distance_s", dist_us_col / F.lit(1e6))
        .withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
    )


def _nearest_k_unbounded(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    k: int,
    left_id: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    direction: str,
    suffix: str,
    initial_radius_s: float,
    min_distance_s: float | None = None,
) -> DataFrame:
    """Iterative radius doubling (see ``nearest_k``). Once the radius
    covers the combined span of both sides every remaining row has seen
    ALL its candidates, so rows with <k neighbors terminate with what
    exists (matching the reference's unbounded bin replication,
    ``GenometricJoin.scala:284-331``, without replicating the whole
    table ±∞). A ``min_distance_s`` lower bound composes soundly: the
    per-round candidate set is already filtered to ``|Δ| > d_min``, so
    "has ≥ k candidates within radius r" still certifies global top-k
    (every unseen candidate is farther than r ≥ the k-th distance)."""
    spark = left.sparkSession
    bounds = right.agg(
        F.min(F.unix_micros(F.col(right_ts))).alias("lo"),
        F.max(F.unix_micros(F.col(right_ts))).alias("hi"),
    ).collect()[0]
    empty_schema_probe = nearest_k(
        left.limit(0), right.limit(0), keys, k=k, max_distance_s=initial_radius_s,
        left_id=left_id, left_ts=left_ts, right_ts=right_ts,
        right_cols=right_cols, direction=direction, suffix=suffix,
        min_distance_s=min_distance_s,
    )
    if bounds.lo is None:
        return empty_schema_probe
    lb2 = left.agg(
        F.min(F.unix_micros(F.col(left_ts))).alias("lo"),
        F.max(F.unix_micros(F.col(left_ts))).alias("hi"),
    ).collect()[0]
    # a radius covering max(|l - r|) over both spans sees every candidate
    span_s = max(abs(bounds.hi - lb2.lo), abs(lb2.hi - bounds.lo)) / 1e6
    radius = max(initial_radius_s, 1e-6)
    remaining = left
    finished = [empty_schema_probe]
    while True:
        res = nearest_k(
            remaining, right, keys, k=k, max_distance_s=radius,
            left_id=left_id, left_ts=left_ts, right_ts=right_ts,
            right_cols=right_cols, direction=direction, suffix=suffix,
            min_distance_s=min_distance_s,
        )
        exhaustive = radius >= span_s
        if exhaustive:
            finished.append(res)
            break
        full = (
            res.groupBy(left_id)
            .agg(F.count(F.lit(1)).alias("_m"))
            .filter(F.col("_m") >= k)
            .select(left_id)
        )
        finished.append(res.join(full, on=left_id, how="left_semi"))
        remaining = remaining.join(full, on=left_id, how="left_anti")
        # localCheckpoint truncates the growing anti-join lineage across
        # rounds (plain persist leaves the logical plan growing without
        # bound — O(rounds) joins deep — until plan stringification and
        # optimization themselves blow up)
        remaining = remaining.localCheckpoint(eager=True)
        if remaining.isEmpty():
            break
        radius *= 2.0
    out = finished[0]
    for f in finished[1:]:
        out = out.unionByName(f)
    return out


BUILDERS = ("both", "left", "right", "intersection", "contig")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] = (),
    max_distance_s: float = 0.0,
    bucket_s: float = 3600.0,
    left_start: str = "start_ts",
    left_end: str = "end_ts",
    right_start: str = "start_ts",
    right_end: str = "end_ts",
    builder: str = "both",
    distinct: bool = False,
    suffix: str = "_r",
    min_distance_s: float | None = None,
    wildcard_keys: Sequence[str] = (),
) -> DataFrame:
    """Interval overlap/proximity join with GMQL region-builder output
    variants (``GenometricJoin.scala:345-372``,
    ``RegionBuilder.scala:11-13``).

    Match: the two intervals overlap after extending the left one by
    ``max_distance_s`` on both ends, i.e.
    ``l.start - d < r.end AND r.start < l.end + d`` (d=0 → strict
    overlap, GMQL's ``DistLess`` with negative distance iff overlap,
    ``:375-386``).

    ``min_distance_s``: GMQL ``DistGreater`` — additionally require the
    reference's interval distance (``GenometricJoin.scala:375-386``:
    the smaller edge distance, negated iff the intervals overlap) to be
    STRICTLY greater than the bound. A negative bound admits overlaps
    shallower than ``|bound|``; e.g. ``min_distance_s=0`` keeps only
    matches separated by a positive gap (within ``max_distance_s``).

    Physical plan: both sides exploded to the ``bucket_s``-wide time
    buckets their (extended) span covers → equi-join on (bucket, keys) +
    residual — the reference's binning trick (``:284-331``) expressed
    declaratively. Duplicate matches across shared buckets are removed
    by the owner-bucket test (pair counted only in the first bucket both
    spans share, the reference's bin-ownership check ``:117-127``).

    ``builder``:
    - ``'both'``: all left columns + all right columns (suffixed on
      collision) — GMQL BOTH.
    - ``'left'`` / ``'right'``: that side's coordinates + both payloads —
      with ``distinct=True`` ≙ LEFT_DISTINCT/RIGHT_DISTINCT
      (whole-row dedup, ``:205-233``).
    - ``'intersection'``: adds ``int_start``/``int_end`` =
      greatest(starts)/least(ends) — GMQL INT.
    - ``'contig'``: adds ``contig_start``/``contig_end`` =
      least(starts)/greatest(ends) — GMQL CONTIG.

    ``wildcard_keys``: GMQL's 3-valued strand matching
    (``GenometricJoin.scala:123``: ``l.strand=='*' || r.strand=='*' ||
    l.strand==r.strand``) generalized to any dimension — listed keys
    match when equal OR either side holds the ``'*'`` wildcard. They are
    RESIDUAL predicates, not equi-join keys (a ``'*'`` row must meet
    every bucket partner), exactly like the reference checks strand
    after its (bin, chrom) join; the join stays an equi-join on (bucket
    + the remaining ``keys``). Both output sides keep their own column
    (right suffixed) since the matched values may differ.
    """
    if builder not in BUILDERS:
        raise ValueError(f"builder must be one of {BUILDERS}")
    keys = list(keys)
    wildcard_keys = list(wildcard_keys)
    overlap = set(keys) & set(wildcard_keys)
    if overlap:
        raise ValueError(f"keys and wildcard_keys overlap: {sorted(overlap)}")
    bucket_us = max(int(bucket_s * 1e6), 1)
    dist_us = int(max_distance_s * 1e6)

    # rename right columns that collide with left (keys join+drop)
    lcols = set(left.columns)
    ren = {c: (c + suffix if c in lcols else c) for c in right.columns if c not in keys}
    r2 = right.select(*keys, *[F.col(c).alias(n) for c, n in ren.items()])
    rs, re_ = ren[right_start], ren[right_end]

    lb = left.withColumn(
        "_lb0", F.floor((F.unix_micros(F.col(left_start)) - dist_us) / F.lit(bucket_us)).cast("long")
    ).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.col("_lb0"),
                F.floor((F.unix_micros(F.col(left_end)) + dist_us) / F.lit(bucket_us)).cast("long"),
            )
        ),
    )
    rb = r2.withColumn(
        "_rb0", F.floor(F.unix_micros(F.col(rs)) / F.lit(bucket_us)).cast("long")
    ).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.col("_rb0"),
                F.floor(F.unix_micros(F.col(re_)) / F.lit(bucket_us)).cast("long"),
            )
        ),
    )
    cond = [lb["_bucket"] == rb["_bucket"]] + [lb[kk] == rb[kk] for kk in keys]
    cond += [
        F.unix_micros(lb[left_start]) - dist_us < F.unix_micros(rb[re_]),
        F.unix_micros(rb[rs]) < F.unix_micros(lb[left_end]) + dist_us,
        # owner-bucket dedup: count the pair only in the first shared bucket
        lb["_bucket"] == F.greatest(lb["_lb0"], rb["_rb0"]),
    ]
    if min_distance_s is not None:
        # reference distanceCalculator (GenometricJoin.scala:375-386):
        # min of the two edge distances, negated iff the intervals
        # overlap (half-open [start, end))
        d1 = F.unix_micros(lb[left_start]) - F.unix_micros(rb[re_])
        d2 = F.unix_micros(rb[rs]) - F.unix_micros(lb[left_end])
        edge_min = F.least(F.abs(d1), F.abs(d2))
        disjoint = (F.unix_micros(lb[left_end]) < F.unix_micros(rb[rs])) | (
            F.unix_micros(rb[re_]) < F.unix_micros(lb[left_start])
        )
        ref_dist = F.when(disjoint, edge_min).otherwise(-edge_min)
        cond.append(ref_dist > int(min_distance_s * 1e6))
    for wk in wildcard_keys:
        rname = ren.get(wk, wk)
        cond.append(
            (lb[wk] == rb[rname])
            | (lb[wk] == F.lit("*"))
            | (rb[rname] == F.lit("*"))
        )
    j = lb.join(rb, cond, "inner").drop("_bucket", "_lb0", "_rb0")
    for kk in keys:  # keep the left copy of each join key only
        j = j.drop(rb[kk])

    if builder == "left":
        j = j.drop(rs, re_)
    elif builder == "right":
        j = j.drop(left_start, left_end)
    elif builder == "intersection":
        j = j.withColumn("int_start", F.greatest(F.col(left_start), F.col(rs))).withColumn(
            "int_end", F.least(F.col(left_end), F.col(re_))
        )
    elif builder == "contig":
        j = j.withColumn("contig_start", F.least(F.col(left_start), F.col(rs))).withColumn(
            "contig_end", F.greatest(F.col(left_end), F.col(re_))
        )
    return j.distinct() if distinct else j


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    max_distance_s: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
    min_distance_s: float | None = None,
) -> DataFrame:
    """All (left, right) pairs with |left_ts - right_ts| <= max_distance
    within each key (GMQL ``DistLess``). Bucketed equi-prefix: the left
    side is exploded to its bucket ±1 so the range predicate becomes an
    equi-join (bucket, keys) + residual predicate — Catalyst plans a
    normal shuffled hash/sort-merge join instead of a
    broadcast-nested-loop.

    ``min_distance_s``: GMQL ``DistGreater`` (``AtomicCondition.scala:
    15-19``) — additionally require ``|Δts| > min_distance_s`` (STRICT,
    reference parity: ``GenometricJoin.scala:169-170`` filters
    ``min < distance``). The bucket width stays driven by
    ``max_distance_s`` alone; the lower bound is a residual predicate
    (a "ring" join: pairs between d_min and d_max apart).

    Only ``how='inner'`` is supported: each left row exists in 3 exploded
    bucket copies, so outer variants would emit duplicate null-extended
    rows (and a post-join residual filter would silently drop them) —
    rejected explicitly rather than returning wrong results.
    """
    if how != "inner":
        raise ValueError(
            "range_join supports how='inner' only (outer variants would "
            "duplicate null-extended rows across exploded buckets); use "
            "nearest_k/asof_join/interval_join for other semantics"
        )
    bucket_us = int(max_distance_s * 1e6)
    lus = F.unix_micros(F.col(left_ts))
    rus = F.unix_micros(F.col(right_ts))
    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence((lus / bucket_us).cast("long") - 1, (lus / bucket_us).cast("long") + 1)
        ),
    )
    rb = right.withColumn("_bucket", (rus / bucket_us).cast("long"))
    abs_delta = F.abs(F.unix_micros(lb[left_ts]) - F.unix_micros(rb[right_ts]))
    cond = [lb["_bucket"] == rb["_bucket"]] + [lb[k] == rb[k] for k in keys]
    cond.append(abs_delta <= bucket_us)
    if min_distance_s is not None:
        cond.append(abs_delta > int(min_distance_s * 1e6))
    return lb.join(rb, cond, how).drop("_bucket")


# GMQL JoinQuadruple atomic conditions (AtomicCondition.scala:9-35),
# temporal recast: distance = |left_ts - right_ts|; upstream = right
# at-or-before left (ties match, as the reference's `stop <= start`),
# downstream = at-or-after.
_ATOMIC = ("dist_less", "dist_greater", "min_distance", "upstream", "downstream")


def join_conditions(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    conditions: Sequence,
    left_id: str = "event_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    suffix: str = "_r",
) -> DataFrame:
    """GMQL's chained join conditions (``JoinQuadruple.scala:7-15``:
    up to 4 atomic conditions "the filtering must be performed in
    order"), temporal recast over point events.

    ``conditions`` is an ordered sequence of
    ``("dist_less", seconds)`` / ``("dist_greater", seconds)`` /
    ``("min_distance", k)`` / ``"upstream"`` / ``"downstream"``.
    Exactly as the reference splits a quadruple
    (``GenometricJoin.scala:65-74``): conditions BEFORE the (single)
    ``min_distance`` restrict the candidate pairs
    (``checkRegionCondition``, ``:246-281``: strict ``distance < less``
    / ``distance > greater`` bounds plus direction); ``min_distance(k)``
    then keeps each left row's k nearest candidates INCLUDING ties at
    the k-th distance (``:130-151``: ``filter(_._2 <= itr(count-1)._2)``
    — note this differs from ``nearest_k``'s exactly-k tiebreak);
    conditions AFTER it filter that ranked result (``:160-188``).

    Physical plan: ONE bucketed equi-prefix join sized by the smallest
    pre-phase ``dist_less`` bound (the explode is driven by d_max only —
    d_min/direction are residual predicates), then a per-left-row window
    rank, then post filters. A pre-phase ``dist_less`` is required: it
    is what bounds the candidate volume (for unbounded nearest use
    ``nearest_k(max_distance_s=None)``).

    Output: left columns + ``<right_ts><suffix>`` + suffixed
    ``right_cols`` + signed ``distance_s`` (positive = right before
    left) + ``nn_rank`` when ``min_distance`` is present.
    """
    norm: list[tuple] = []
    for c in conditions:
        c = (c,) if isinstance(c, str) else tuple(c)
        if c[0] not in _ATOMIC:
            raise ValueError(f"unknown atomic condition {c[0]!r}; use one of {_ATOMIC}")
        norm.append(c)
    ks = [i for i, c in enumerate(norm) if c[0] == "min_distance"]
    if len(ks) > 1:
        raise ValueError("at most one min_distance condition is supported")
    split = ks[0] if ks else len(norm)
    pre, post = norm[:split], norm[split + 1 :]
    k = norm[split][1] if ks else None
    if post and not ks:
        raise AssertionError("unreachable: post conditions imply a min_distance")

    less = [c[1] for c in pre if c[0] == "dist_less"]
    if not less:
        raise ValueError(
            "a dist_less bound before min_distance is required to bound the "
            "candidate join (reference caps via MAXIMUM_DISTANCE, "
            "GenometricJoin.scala:76-78); for unbounded nearest-neighbor "
            "semantics use nearest_k(max_distance_s=None, min_distance_s=...)"
        )
    bucket_us = max(int(min(less) * 1e6), 1)

    lus = F.unix_micros(F.col(left_ts))
    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence((lus / bucket_us).cast("long") - 1, (lus / bucket_us).cast("long") + 1)
        ),
    )
    rsel = right.select(
        *keys,
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    rsel = rsel.withColumn(
        "_bucket", (F.unix_micros(F.col(f"{right_ts}{suffix}")) / bucket_us).cast("long")
    )
    signed_us = F.unix_micros(lb[left_ts]) - F.unix_micros(rsel[f"{right_ts}{suffix}"])

    def _residual(c: tuple):
        if c[0] == "dist_less":
            return F.abs(signed_us) < int(c[1] * 1e6)
        if c[0] == "dist_greater":
            return F.abs(signed_us) > int(c[1] * 1e6)
        if c[0] == "upstream":
            return signed_us >= 0
        return signed_us <= 0  # downstream

    cond = [lb["_bucket"] == rsel["_bucket"]] + [lb[kk] == rsel[kk] for kk in keys]
    cond += [_residual(c) for c in pre]
    joined = lb.join(rsel, cond, "inner").drop("_bucket")
    for kk in keys:
        joined = joined.drop(rsel[kk])

    dist_us = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(f"{right_ts}{suffix}"))
    # integer µs kept through rank + post filters (strict bounds must
    # not pass through a float µs→s→µs round-trip)
    out = joined.withColumn("_dist_us", dist_us).withColumn(
        "distance_s", dist_us / F.lit(1e6)
    )
    if k is not None:
        # rank (not row_number): ties at the k-th distance all survive,
        # the reference's MinDistance semantics
        w = Window.partitionBy(left_id).orderBy(F.abs(F.col("_dist_us")).asc())
        out = out.withColumn("nn_rank", F.rank().over(w)).filter(F.col("nn_rank") <= k)
    for c in post:
        if c[0] == "dist_less":
            out = out.filter(F.abs(F.col("_dist_us")) < int(c[1] * 1e6))
        elif c[0] == "dist_greater":
            out = out.filter(F.abs(F.col("_dist_us")) > int(c[1] * 1e6))
        elif c[0] == "upstream":
            out = out.filter(F.col("_dist_us") >= 0)
        else:
            out = out.filter(F.col("_dist_us") <= 0)
    return out.drop("_dist_us")
