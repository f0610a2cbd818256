"""Generate the exact-oracle fixture for the multimodal feature gate.

The stub decoder (`operators.multimodal._fake_decode`) is deterministic
pure numpy (sha256-seeded PCG64), so its expected output is computable
OUTSIDE Spark. This script replicates the full gate arithmetic —
decode -> moment-pool to 8 float64 means -> float32 quantization (the
`array<float>` Arrow schema) -> Spark's `F.aggregate` fold
`acc_f64 + f64(x_f32 * x_f32)` — in plain numpy, keyed by md5(text) so
one fixture serves every sf dir (the oracle SQL joins it to the
`documents` view on `md5(text)`).

Usage: python tools/make_multimodal_fixture.py [sf_dir ...] [-o OUT]
Defaults: all three /root/testdata/sf* dirs ->
tests/fixtures/multimodal_features.parquet
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmql_spark.operators.multimodal import _fake_decode  # noqa: E402

DIM = 8


def expected_row(text: str) -> tuple[int, float]:
    """(n_dims, sq_norm) exactly as the Spark gate computes them."""
    payload = text.encode("utf-8")
    arr = _fake_decode(payload).astype(np.float64)
    chunks = np.array_split(arr, DIM)
    feats64 = [float(c.mean()) if len(c) else 0.0 for c in chunks]
    feat32 = np.array(feats64, dtype=np.float32)
    # Spark: aggregate(feature, 0.0D, (acc, x) -> acc + x * x):
    # x * x multiplies in FLOAT (round-to-nearest f32), the running
    # accumulator adds in DOUBLE — replicate step for step.
    acc = np.float64(0.0)
    for x in feat32:
        acc = acc + np.float64(x * x)
    return len(feat32), float(acc)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "-o"]
    out = "tests/fixtures/multimodal_features.parquet"
    if "-o" in sys.argv:
        out = sys.argv[sys.argv.index("-o") + 1]
        args.remove(out)
    sf_dirs = args or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]

    import duckdb

    seen: dict[str, tuple[int, float]] = {}
    for d in sf_dirs:
        texts = (
            duckdb.sql(
                f"SELECT DISTINCT text FROM parquet_scan('{d}/documents.parquet') "
                "WHERE length(text) > 0"
            )
            .fetchnumpy()["text"]
        )
        for t in texts:
            k = hashlib.md5(t.encode("utf-8")).hexdigest()
            if k not in seen:
                seen[k] = expected_row(t)

    keys = sorted(seen)
    table = pa.table(
        {
            "text_md5": pa.array(keys, pa.string()),
            "n_dims": pa.array([seen[k][0] for k in keys], pa.int32()),
            "sq_norm": pa.array([seen[k][1] for k in keys], pa.float64()),
        }
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(table, out)
    print(f"wrote {len(keys)} rows -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
