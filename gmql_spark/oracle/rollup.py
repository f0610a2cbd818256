"""Pandas oracle for tumbling-window rollups and gap-fill.

Semantics contract (shared with gmql_spark.operators.rollup):

- window: tumbling, aligned to the unix epoch, labeled by window START.
- inter-turn latency: ``gap_i = ts_i - ts_{i-1}`` within a conversation
  ordered by ``turn_idx`` (the stable ordering key); the gap is attributed
  to the *later* turn's window; the first turn of a conversation has no gap.
- percentiles: exact, linear interpolation (numpy default) — the same
  definition as Spark's ``percentile`` and DuckDB's ``quantile_cont``.
- role_counts / tool_counts: value-count dicts; zero entries absent; tool
  NULLs not counted (GMQL aggregates skip nulls — reference
  ``DefaultRegionsToRegionFactory.scala:58-126``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TIER_FREQ = {"1m": "1min", "1h": "1h", "1d": "1D"}
TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def _counts_dict(s: pd.Series) -> dict:
    vc = s.dropna().value_counts()
    return {str(k): int(v) for k, v in sorted(vc.items())}


def _pct_plain_lerp(sorted_vals: np.ndarray, p: float) -> float:
    """Exact percentile, *weighted*-form linear interpolation
    ``lo_v*(hi-pos) + hi_v*(pos-lo)`` — bit-identical to Spark's exact
    ``percentile`` aggregate (verified empirically; numpy's symmetric lerp
    and the naive ``lo + (hi-lo)*frac`` both differ in the last ulp)."""
    n = len(sorted_vals)
    pos = p * (n - 1)
    lo = int(np.floor(pos))
    hi = int(np.ceil(pos))
    if lo == hi:
        return float(sorted_vals[lo])
    return float(sorted_vals[lo] * (hi - pos) + sorted_vals[hi] * (pos - lo))


def oracle_rollup(pdf: pd.DataFrame, tier: str = "1m") -> pd.DataFrame:
    """Per (conv_id, window_start) rollup. Output sorted by (conv_id, window_start)."""
    freq = TIER_FREQ[tier]
    df = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").copy()
    # integer-microsecond diff → /1e6, bit-identical to Spark's
    # (unix_micros - lag(unix_micros)) / 1e6 (see operators.rollup)
    d = df.groupby("conv_id")["ts"].diff().to_numpy()
    us = d.astype("timedelta64[us]").astype("float64")
    us[np.isnat(d)] = np.nan
    df["gap_us"] = us
    df["gap_s"] = us / 1e6
    df["window_start"] = df["ts"].dt.floor(freq)

    rows = []
    for (conv, w), g in df.groupby(["conv_id", "window_start"], sort=True):
        gaps = np.sort(g["gap_s"].dropna().to_numpy())
        gaps_us = g["gap_us"].dropna().to_numpy()
        has = len(gaps) > 0
        rows.append(
            {
                "conv_id": conv,
                "window_start": w,
                "window_end": w + pd.Timedelta(seconds=TIER_SECONDS[tier]),
                "turn_count": len(g),
                "role_counts": _counts_dict(g["role"]),
                "tool_counts": _counts_dict(g["tool"]),
                "latency_p50": _pct_plain_lerp(gaps, 0.50) if has else None,
                "latency_p95": _pct_plain_lerp(gaps, 0.95) if has else None,
                "latency_p99": _pct_plain_lerp(gaps, 0.99) if has else None,
                "latency_cnt": int(len(gaps)),
                "latency_sum_us": int(gaps_us.sum()) if has else None,
                "first_ts": g["ts"].min(),
                "last_ts": g["ts"].max(),
            }
        )
    out = pd.DataFrame(rows)
    return out.reset_index(drop=True)


def oracle_gapfill_1m(rollup_1m: pd.DataFrame) -> pd.DataFrame:
    """Materialize empty 1m windows per conversation (min..max window span),
    with turn_count=0, LOCF of turn_count, and linear interpolation of
    latency_p50 (nullable at edges). FIXTURES.md §3.2."""
    rows = []
    for conv, g in rollup_1m.groupby("conv_id", sort=True):
        g = g.sort_values("window_start")
        full = pd.date_range(g["window_start"].min(), g["window_start"].max(), freq="1min")
        gi = g.set_index("window_start").reindex(full)
        present = gi["turn_count"].notna()
        tc = gi["turn_count"].fillna(0).astype(np.int64)
        locf = gi["turn_count"].ffill().astype(np.int64)
        # linear interpolation of latency_p50 between known points, inside
        # only. Explicit prev + (next-prev) * frac with frac computed from
        # epoch-second longs — the exact double ops the Spark operator does
        # (pandas' interpolate uses a different float path; last-ulp drift).
        vals = gi["latency_p50"].astype(float).to_numpy()
        t = full.asi8 // 1_000_000_000  # epoch seconds
        known = ~np.isnan(vals)
        interp = np.full(len(vals), np.nan)
        interp[known] = vals[known]
        kidx = np.where(known)[0]
        for a, b in zip(kidx[:-1], kidx[1:]):
            for i in range(a + 1, b):
                frac = float(t[i] - t[a]) / float(t[b] - t[a])
                interp[i] = vals[a] + (vals[b] - vals[a]) * frac
        rows.append(
            pd.DataFrame(
                {
                    "conv_id": conv,
                    "window_start": full,
                    "turn_count": tc.to_numpy(),
                    "is_gap": (~present).to_numpy(),
                    "turn_count_locf": locf.to_numpy(),
                    "latency_interp": interp,
                }
            )
        )
    return pd.concat(rows, ignore_index=True)
