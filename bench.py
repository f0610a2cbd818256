"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also measures the engine's flagship transcript rollup throughput
(turns/sec) on a synthetic transcript table, since that is BASELINE.json's
headline metric; the scaling run (N vs 4N cores) lives in
tools/bench_scaling.py to keep this entrypoint fast.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
# python workers (Arrow UDFs in the Gorilla bench) import gmql_spark too
os.environ["PYTHONPATH"] = _HERE + os.pathsep + os.environ.get("PYTHONPATH", "")

# r5 board renames: rollup_windows = rollup_1m + sliding_rollup merged;
# ann_topk = lsh + ivf variants merged; ivf_trained = k-means-trained IVF
BENCH_QUERIES = [
    "rollup_windows",
    "rollup_1h_cascade",
    "merge_global_1h",
    "latency_percentiles",
    "gapfill",
    "topk_per_user",
    "difference",
    "asof_join",
    "ring_join",
    "nearest_beyond",
    "cover_accumulation",  # r7: tag union HISTOGRAM + SUMMIT (shared sweep)
    "cover_jaccard",
    "percentile_digest_ok",  # t-digest build -> cascade -> extract, bound-checked
    "map_intervals",
    "dedup_exact",
    "cosine_topk",
    "ann_topk",
    "ivf_trained",
    "nearest_k",
    "interval_intersect",
    "realtime_rollup",
    "latency_histogram",
    "range_stitch",
    # a REAL Structured Streaming drain (stage -> availableNow ->
    # foreachBatch parquet sink) measured like any other headline query
    "stream_rollup",
]


def _loadavg() -> list[float] | None:
    """1/5/15-minute load averages — co-tenant context for the run.
    This box shows ±25% wall-clock swings from co-tenant CPU; recording
    the load with the numbers lets a later reader separate code movement
    from box movement instead of guessing."""
    try:
        return list(os.getloadavg())
    except OSError:
        return None


def _calibration(spark) -> float:
    """Fixed CPU-bound probe measured once per rep: a deterministic
    16M-row hash-and-reduce with no I/O and one scalar result. Every
    query's noise-normalized view is its median ÷ the calibration
    median, so a globally slow box window shows up as a high
    calibration value instead of masquerading as a code regression."""
    import time as _t

    from pyspark.sql import functions as F

    t0 = _t.perf_counter()
    spark.range(0, 16_000_000, 1, 32).select(
        F.expr("bit_xor(xxhash64(id))")  # bit_xor: sum(xxhash64) overflows under ANSI
    ).collect()
    return _t.perf_counter() - t0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_start = _loadavg()

    import __spark_entry__ as entrymod
    from gmql_spark.session import get_spark

    spark = get_spark(cores=cpus, app_name="gmql-spark-bench")
    qs = entrymod.queries()

    # warm the JVM + parquet footer cache once
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # ≥3 INTERLEAVED reps per query, report per-query MEDIANS (this box
    # shows 15-25% co-tenant wall-clock swings; single reps made
    # per-query regressions undetectable — see BENCH/BASELINE.md).
    # Interleaving (rep loop outside the query loop) decorrelates a
    # noise burst from any one query's reps; raw reps ship in the JSON.
    import statistics

    from pyspark.sql import functions as F

    from gmql_spark.operators.dedup import minhash_lsh_pairs

    qreps = int(os.environ.get("GMQL_BENCH_QREPS", "3"))
    rep_times: dict[str, list[float]] = {}

    # minhash on the engine's xxhash64 fast path (the CORRECTNESS gate
    # keeps the portable-md5 mode for the exact DuckDB oracle; 64 md5
    # string hashes per shingle are an oracle artifact, not the
    # production plan — the bench measures the plan a user would run).
    # Small single-file table -> 1 scan task; spread the shingle explode
    # + 64 hash-min aggregates across cores (at warehouse scale the scan
    # has many splits and this repartition is unnecessary)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 2000)
        .repartition(int(cpus))
    )

    cal_times: list[float] = []
    for rep in range(max(qreps, 1)):
        cal_times.append(_calibration(spark))
        print(f"# [{rep}] calibration: {cal_times[-1]:.3f}s", file=sys.stderr)
        for name in BENCH_QUERIES:
            if name not in qs:
                continue
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()  # full materialization
            dt = time.perf_counter() - t0
            rep_times.setdefault(name, []).append(dt)
            print(f"# [{rep}] {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
        t0 = time.perf_counter()
        n = minhash_lsh_pairs(
            docs, num_perm=64, bands=16, threshold=0.5, hash_fn="xxhash64"
        ).count()
        dt = time.perf_counter() - t0
        rep_times.setdefault("minhash_lsh", []).append(dt)
        print(f"# [{rep}] minhash_lsh (xxhash64): {dt:.3f}s ({n} rows)", file=sys.stderr)

    times: dict[str, float] = {
        k: round(statistics.median(v), 3) for k, v in rep_times.items()
    }

    # flagship transcript rollup throughput (BASELINE.json metric)
    from gmql_spark.datagen import ROLES, TOOL_NAMES, transcripts_spark
    from gmql_spark.operators.rollup import rollup_all_tiers

    n_conv = int(os.environ.get("GMQL_BENCH_CONV", "20000"))
    reps = int(os.environ.get("GMQL_BENCH_REPS", "2"))
    raw = transcripts_spark(spark, n_conv=n_conv)
    raw.cache()
    n_turns = raw.count()
    # best of N reps: this box shows sustained ±25%+ co-tenant noise
    # (BENCH/BASELINE.md); the headline metric takes the least-disturbed
    # run, each rep a full fresh rollup (tiers unpersisted in between)
    rollup_wall = float("inf")
    tiers = gaps = None
    for _ in range(max(reps, 1)):
        if tiers is not None:  # drop ALL rep-1 caches or rep 2 reuses them
            for df in tiers.values():
                df.unpersist()
            gaps.unpersist()
        t0 = time.perf_counter()
        tiers, gaps = rollup_all_tiers(
            raw,
            role_values=list(ROLES),
            tool_values=list(TOOL_NAMES),
            cache_gaps=True,
            persist_tiers=True,
            return_gaps=True,
        )
        for t, df in tiers.items():
            df.write.mode("overwrite").format("noop").save()
        rollup_wall = min(rollup_wall, time.perf_counter() - t0)
    times["transcript_rollup_tiers"] = round(rollup_wall, 3)

    # north-rule storage codec: Gorilla pack + unpack of the 1m tier's
    # turn_count series through the Arrow grouped-map path
    from gmql_spark.compression.gorilla import compress_series, decompress_series

    series = tiers["1m"].select(
        "conv_id", "window_start", tiers["1m"]["turn_count"].cast("double").alias("val")
    )
    for rep in range(max(qreps, 1)):
        t0 = time.perf_counter()
        packed = compress_series(
            series, keys=["conv_id"], ts_col="window_start", value_col="val"
        ).persist()
        n_pts = packed.agg({"n_points": "sum"}).collect()[0][0]
        n_back = decompress_series(packed, keys=["conv_id"]).count()
        dt = time.perf_counter() - t0
        rep_times.setdefault("gorilla_roundtrip", []).append(dt)
        assert n_back == n_pts, (n_back, n_pts)
        packed.unpersist()
        print(f"# [{rep}] gorilla_roundtrip: {dt:.3f}s ({n_pts} points)", file=sys.stderr)
    times["gorilla_roundtrip"] = round(
        statistics.median(rep_times["gorilla_roundtrip"]), 3
    )
    raw.unpersist()

    total = round(sum(times.values()), 3)
    cal = statistics.median(cal_times)
    out = {
        "metric": "headline query wall-clock + transcript tier-rollup",
        "value": total,
        "unit": "sec",
        "queries": times,
        "query_reps": {k: [round(x, 3) for x in v] for k, v in rep_times.items()},
        "rep_policy": f"per-query median of {qreps} interleaved reps",
        "sf": sf,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / rollup_wall, 1),
        "cpus": cpus,
        # noise protocol: per-rep calibration (fixed 16M-row hash probe)
        # + box load context; normalized = query median / calibration
        # median, comparable across box-noise windows
        "calibration_sec": round(cal, 3),
        "calibration_reps": [round(x, 3) for x in cal_times],
        "normalized": {k: round(v / cal, 2) for k, v in times.items()},
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
