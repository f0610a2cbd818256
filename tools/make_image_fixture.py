"""Generate the pixel-level oracle fixture for the image_decode gate.

The gate synthesizes a deterministic test image per document
(``multimodal.synth_image``: sha256(text)-seeded PCG64 pixels), encodes
it to BMP or PPM, decodes it back with the REAL pure-numpy codecs, and
emits exact integer/digest stats. This script computes the same stats
from the PIXELS alone — no encode, no decode — keyed by md5(text), so
the gate's value match proves the codec round trip (the expected side
never touches the codecs' byte layout).

Usage: python tools/make_image_fixture.py [sf_dir ...] [-o OUT]
Defaults: all three /root/testdata/sf* dirs ->
tests/fixtures/image_decode.parquet
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmql_spark.operators.multimodal import synth_image  # noqa: E402


def expected_row(text: str) -> tuple[int, int, int, int, str]:
    px, _ = synth_image(text.encode("utf-8"), "ppm")  # fmt ignored: px only
    h, w, ch = px.shape
    return (
        int(w),
        int(h),
        int(ch),
        int(px.astype(np.int64).sum()),
        hashlib.md5(np.ascontiguousarray(px).tobytes()).hexdigest(),
    )


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dirs", nargs="*", default=[])
    ap.add_argument("-o", dest="out", default="tests/fixtures/image_decode.parquet")
    ns = ap.parse_intermixed_args()  # allow positionals around -o
    out = ns.out
    sf_dirs = ns.sf_dirs or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]

    import duckdb

    seen: dict[str, tuple[int, int, int, int, str]] = {}
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
            "width": pa.array([seen[k][0] for k in keys], pa.int32()),
            "height": pa.array([seen[k][1] for k in keys], pa.int32()),
            "channels": pa.array([seen[k][2] for k in keys], pa.int32()),
            "px_sum": pa.array([seen[k][3] for k in keys], pa.int64()),
            "px_md5": pa.array([seen[k][4] for k in keys], pa.string()),
        }
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(table, out)
    print(f"wrote {len(keys)} rows -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
