"""Retention: tier-aware expiry of old data.

North rule: "Continuous aggregates are materialized into retention
tiers (raw -> 1m -> 1h -> 1d)". Retention = each tier keeps a bounded
trailing window of event time; finer tiers expire sooner (raw keeps
days, 1m keeps weeks, 1d keeps forever). With an Iceberg catalog this
is ``expire_snapshots`` + partition-predicate deletes; on the parquet
fallback layout it is directory-level deletion of expired
``event_date=`` partitions — the same O(partitions) metadata operation,
no data rewrite.
"""

from __future__ import annotations

import os
import re
import shutil
from datetime import date, timedelta

DEFAULT_POLICY = {"raw": 30, "1m": 90, "1h": 365, "1d": None}  # days to keep


def expire_partitions(
    table_path: str,
    keep_days: int | None,
    as_of: date | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Delete ``event_date=YYYY-MM-DD`` partition dirs older than the
    horizon. Returns the list of expired partition paths."""
    if keep_days is None:
        return []
    as_of = as_of or date.today()
    horizon = as_of - timedelta(days=keep_days)
    expired = []
    pat = re.compile(r"event_date=(\d{4}-\d{2}-\d{2})$")
    for root, dirs, _files in os.walk(table_path):
        for d in list(dirs):
            m = pat.search(d)
            if m and date.fromisoformat(m.group(1)) < horizon:
                full = os.path.join(root, d)
                expired.append(full)
                if not dry_run:
                    shutil.rmtree(full)
    return sorted(expired)


def apply_retention(
    warehouse: str,
    policy: dict | None = None,
    as_of: date | None = None,
    dry_run: bool = False,
) -> dict[str, list[str]]:
    """Apply a per-tier retention policy over a warehouse directory
    (``<warehouse>/transcripts`` for raw, ``<warehouse>/rollup_<tier>``)."""
    policy = policy or DEFAULT_POLICY
    out = {}
    for tier, keep in policy.items():
        path = (
            os.path.join(warehouse, "transcripts")
            if tier == "raw"
            else os.path.join(warehouse, f"rollup_{tier}")
        )
        if os.path.exists(path):
            out[tier] = expire_partitions(path, keep, as_of=as_of, dry_run=dry_run)
    return out


def compact_partitions(
    spark,
    table_path: str,
    partition_col: str = "window_date",
    min_files: int = 2,
    partitions: list | None = None,
) -> dict[str, int]:
    """Rewrite fragmented table partitions into one file each — the
    Iceberg ``rewrite_data_files`` (compaction) analogue for the
    parquet-layout fallback. Incremental tier refreshes overwrite whole
    date partitions so fragmentation there is bounded, but append-heavy
    fact tables and frequent small refreshes accrete small files;
    compaction is the standing maintenance job that keeps scan task
    counts sane at warehouse scale.

    Only partitions holding more than ``min_files`` parquet files are
    rewritten (read -> hash-repartition on the partition column ->
    dynamic partition overwrite of just those partitions, one
    O(rewritten-partitions) job — never a full-table rewrite). Returns
    {partition_value: files_before} for the rewritten partitions."""
    import os as _os

    from pyspark.sql import functions as _F

    frag: dict[str, int] = {}
    for entry in sorted(_os.listdir(table_path)):
        if not entry.startswith(f"{partition_col}="):
            continue
        val = entry.split("=", 1)[1]
        if partitions is not None and val not in {str(p) for p in partitions}:
            continue
        nfiles = sum(
            1 for f in _os.listdir(_os.path.join(table_path, entry))
            if f.endswith(".parquet")
        )
        if nfiles > min_files:
            frag[val] = nfiles
    if not frag:
        return frag
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df = spark.read.parquet(table_path).filter(
            _F.col(partition_col).isin(list(frag))
        )
        (
            df.repartition(len(frag), partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(table_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    return frag
