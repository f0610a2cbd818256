"""Generate the pixel-level oracle fixture for the image_decode gate.

The gate synthesizes a deterministic test image per document
(``multimodal.synth_image``: sha256(text)-seeded PCG64 pixels), encodes
it to BMP / PPM / JPEG / PNG (doc_id % 4 — the lossless trio share one
pixel synth), decodes it back with the REAL pure-numpy codecs, and
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

from gmql_spark.operators.multimodal import (  # noqa: E402
    synth_image,
    synth_jpeg_pixels,
)


def _stats(px) -> tuple[int, int, int, int, str]:
    h, w = px.shape[:2]
    ch = px.shape[2] if px.ndim == 3 else 1
    return (
        int(w),
        int(h),
        int(ch),
        int(px.astype(np.int64).sum()),
        hashlib.md5(np.ascontiguousarray(px).tobytes()).hexdigest(),
    )


def expected_row(text: str) -> tuple:
    """RGB pixels (bmp/ppm docs) + the jpeg gray-mosaic pixels — the
    codec NEVER runs here: the jpeg synth is exact by construction
    (block-constant, DC step 8 — see jpeg.py), so pixels-only stats
    are the true decode expectation for all three formats."""
    rgb, _ = synth_image(text.encode("utf-8"), "ppm")  # lossless fmts share px
    jpx = synth_jpeg_pixels(text.encode("utf-8"))  # shared pixel synth,
    # codec never runs here — the fixture stays a pixels-only oracle
    return _stats(rgb) + _stats(jpx)


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
            "jwidth": pa.array([seen[k][5] for k in keys], pa.int32()),
            "jheight": pa.array([seen[k][6] for k in keys], pa.int32()),
            "jchannels": pa.array([seen[k][7] for k in keys], pa.int32()),
            "jpx_sum": pa.array([seen[k][8] for k in keys], pa.int64()),
            "jpx_md5": pa.array([seen[k][9] for k in keys], pa.string()),
        }
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(table, out)
    print(f"wrote {len(keys)} rows -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
