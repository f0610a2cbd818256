"""Real-time continuous aggregates: serve closed windows from the
materialized tier, recompute the ragged tail from raw.

The TimescaleDB "real-time aggregate" pattern, recast over the engine's
retention tiers (north-rule: continuous aggregates materialized into
retention tiers). A range query at tier grain Δ is answered as

    tier rows with window_end <= frozen_until
    UNION ALL
    rollup(raw rows with ts >= floor(frozen_until, Δ))

which is exact — tumbling windows partition the time axis on the Δ
grid, so every raw row lands in exactly one of the two branches —
under the standard watermark contract: every raw row NOT yet reflected
in the tier has ``ts >= frozen_until``. ``refresh_tiers`` records that
watermark (max event ts covered by any refresh) in a tiny manifest;
``append_transcripts`` keeps appends per-conversation time-ordered, so
the contract holds for the incremental ingest path by construction.

Why this matters at scale: the tier is ~10³–10⁵× smaller than raw, and
the tail recompute scans at most one Δ of raw (partition-pruned by
``event_date``) — a dashboard query over a month of 1h points reads a
month of tier rows plus ≤1 hour of raw instead of re-scanning 100 TB.

GMQL has no materialization layer to compare against (its STORE is a
terminal write, ``GMQL-Core .../IRStoreRD``); the exactness oracle here
is a full recompute from raw, gated in ``__spark_entry__.queries()``
(`realtime_rollup`) and pytest-tested on the materialized incremental
path (stale tier + un-refreshed appended batch == one-shot rollup).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}

_WATERMARK_FILE = "_refresh_watermark.json"


def floor_to_tier(t: _dt.datetime, tier: str) -> _dt.datetime:
    """Largest Δ-grid point <= t (UTC grid, epoch-anchored — the same
    grid as ``F.window(ts, Δ)`` with no offset)."""
    step = TIER_SECONDS[tier]
    naive = t.replace(tzinfo=None)
    epoch = _dt.datetime(1970, 1, 1)
    secs = int((naive - epoch).total_seconds())
    return epoch + _dt.timedelta(seconds=(secs // step) * step)


def serve_realtime(
    tier_df: DataFrame,
    raw: DataFrame,
    frozen_until: _dt.datetime,
    tier: str,
    recompute: Callable[[DataFrame], DataFrame],
    ts: str = "ts",
) -> DataFrame:
    """The routing algebra: closed windows from the tier, the rest
    recomputed from raw.

    ``tier_df`` must already be in the query's output schema (with
    ``window_start``/``window_end``); ``recompute(tail_raw)`` must
    produce the identical schema. A window is served from the tier iff
    ``window_end <= frozen_until``; the raw tail starts at
    ``floor(frozen_until, Δ)`` — the start of the first window that is
    not fully frozen. The tail filter is a plain ``ts >=`` predicate,
    so it prunes raw's date partitions and pushes into the scan.
    """
    boundary = floor_to_tier(frozen_until, tier)
    served = tier_df.filter(F.col("window_end") <= F.lit(frozen_until))
    tail = recompute(raw.filter(F.col(ts) >= F.lit(boundary)))
    return served.unionByName(tail)


# ------------------------------------------------- materialized path

def record_refresh_watermark(out_dir: str, watermark_us: int) -> int:
    """Advance (never regress) the tiers' refresh watermark; returns the
    recorded value. Called by ``incremental.refresh_tiers``."""
    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/{_WATERMARK_FILE}"
    prev = read_refresh_watermark(out_dir)
    wm = max(watermark_us, prev if prev is not None else watermark_us)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"watermark_us": wm}, f)
    os.replace(tmp, path)
    return wm


def read_refresh_watermark(out_dir: str) -> int | None:
    path = f"{out_dir}/{_WATERMARK_FILE}"
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)["watermark_us"]


def realtime_rollup(
    spark: SparkSession,
    fact_path: str,
    tiers_dir: str,
    tier: str = "1h",
    frozen_until: _dt.datetime | None = None,
    key: str = "conv_id",
    ts: str = "ts",
    **rollup_kwargs,
) -> DataFrame:
    """Exact tier-grain rollup over everything ingested so far, even
    when the materialized tiers are stale (appends since the last
    ``refresh_tiers``).

    ``frozen_until`` defaults to the tiers' recorded refresh watermark.
    The raw tail is read with the stored ingest-time ``gap_us`` (the
    incremental fact layout), so cross-boundary latency gaps are exact
    without any raw-scale window pass; if the fact table lacks
    ``gap_us`` the gaps are derived over the full raw first (exact, one
    extra shuffle) before the tail filter.
    """
    from gmql_spark.operators.rollup import rollup, with_gap_seconds

    wm = read_refresh_watermark(tiers_dir)
    if frozen_until is None:
        if wm is None:
            raise ValueError(
                f"no refresh watermark recorded under {tiers_dir} and no "
                "frozen_until given — refresh_tiers has never run"
            )
        frozen_until = _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=wm)

    tier_df = spark.read.parquet(f"{tiers_dir}/rollup_{tier}")
    if "window_date" in tier_df.columns:
        tier_df = tier_df.drop("window_date")
    raw = spark.read.parquet(fact_path)
    raw = raw.drop(*[c for c in ("conv_bucket", "event_date") if c in raw.columns])
    if "gap_us" not in raw.columns:
        raw = with_gap_seconds(raw, key=key, ts=ts)

    def recompute(tail: DataFrame) -> DataFrame:
        return rollup(tail, tier, key=key, ts=ts, **rollup_kwargs)

    out = serve_realtime(tier_df, raw, frozen_until, tier, recompute, ts=ts)
    # served/tail column order can differ only by select order; pin it
    return out.select(*recompute(raw.limit(0)).columns)
