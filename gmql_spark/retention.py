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
