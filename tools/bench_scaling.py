"""N-vs-4N scaling benchmark (BASELINE.md: efficiency >= 0.8).

Sandbox stand-in for two cluster sizes: the identical tier-rollup job on
the identical bucketed fact table at local[N] and local[4N] (separate
JVMs). Efficiency = tp(4N) / (4 * tp(N)). Writes BENCH/scaling.json and
refreshes the table in BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [--n-conv 60000] [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def spark_submit(master: str, script: str, *args: str) -> dict:
    cmd = [
        "spark-submit", "--master", master,
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.serializer=org.apache.spark.serializer.KryoSerializer",
        "--conf", "spark.driver.memory=12g",
        script, *args,
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(cmd, capture_output=True, text=True, cwd="/tmp", env=env, check=False)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from {master}: {out.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-conv", type=int, default=600000)
    ap.add_argument("--n", type=int, default=8, help="small cluster size (big = 4n)")
    ap.add_argument("--fact", default="/tmp/gmql_scale_fact")
    ap.add_argument("--reuse-fact", action="store_true")
    ap.add_argument("--engine", default="spark", choices=["pandas", "spark"])
    args = ap.parse_args()

    if not args.reuse_fact or not os.path.exists(args.fact):
        print(f"generating fact table ({args.n_conv} convs) ...", file=sys.stderr)
        gen = spark_submit(
            f"local[{os.cpu_count()}]", f"{REPO}/tools/gen_fact.py",
            "--n-conv", str(args.n_conv), "--out", args.fact,
            "--engine", args.engine,
        )
        print(f"fact table: {gen}", file=sys.stderr)

    meta = json.load(open(f"{args.fact}/_meta.json"))
    turns = meta["turns"]

    results = {}
    for cores in (args.n, 4 * args.n):
        # two runs, keep the faster (page cache warm for both after first)
        best = None
        for _rep in range(2):
            r = spark_submit(
                f"local[{cores}]", f"{REPO}/tools/scale_worker.py",
                "--input", args.fact, "--turns", str(turns),
            )
            best = r if best is None or r["wall_s"] < best["wall_s"] else best
        results[cores] = best
        print(f"local[{cores}]: {best}", file=sys.stderr)

    tp_n = results[args.n]["turns_per_sec"]
    tp_4n = results[4 * args.n]["turns_per_sec"]
    eff = tp_4n / (4 * tp_n)
    summary = {
        "turns": turns,
        "n_cores": args.n,
        "results": results,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/scaling.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
