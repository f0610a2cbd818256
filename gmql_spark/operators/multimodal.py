"""Multimodal columns: images/audio/video as opaque binary + typed
metadata, with Arrow-batched (mapInPandas) decode/feature plumbing.

The Spark-side plumbing (schemas, batching, partitioning, UDF
signatures) is real and tested. Decode: BMP (uncompressed 8/24-bit)
and PPM/PGM (binary P5/P6) are decoded FOR REAL in pure
stdlib+numpy (:func:`decode_image` — no media libraries needed;
:func:`decode_stats` defaults to it). The feature/metadata operators
below keep the deterministic ``_fake_decode`` stand-in as their
DEFAULT ``decoder=`` (their payloads are arbitrary media, and this
container has no JPEG/audio/video codecs); pass ``decode_image`` for
image tables, or ``decode_any`` to dispatch real-vs-stub on the magic
bytes. A real deployment passes e.g. a PIL/librosa-backed decoder with
the same signature.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "meta struct<width:int, height:int, duration_ms:int, sample_rate:int>"
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: bytes -> pseudo pixel/pcm array.

    Used for formats whose real decode needs codec libraries absent in
    this environment (JPEG/PNG/audio/video); BMP and PPM/PGM decode for
    real via :func:`decode_image`. Swap via the ``decoder`` argument of
    the operators below."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload; real decoder required")
    h = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
    n = 64 + int(h[0])  # pseudo dimensions from content
    rng = np.random.Generator(np.random.PCG64(int.from_bytes(h[:8], "little")))
    return rng.integers(0, 256, size=n, dtype=np.uint8)


# ------------------------------------------------ real BMP / PPM codecs

def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, RGB) / PGM (P5, gray) decode -> (h, w, 3) or
    (h, w) uint8, row-major top-down. Header = magic, then width,
    height, maxval as whitespace-separated ASCII ints with ``#``
    comments allowed, then ONE whitespace byte, then raw samples."""
    if len(payload) < 2 or payload[:1] != b"P" or payload[1:2] not in (b"5", b"6"):
        raise ValueError("not a binary PPM/PGM payload")
    channels = 3 if payload[1:2] == b"6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * channels
    data = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return data.reshape((h, w, 3) if channels == 3 else (h, w))


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) -> P6 / (h, w) -> P5, maxval 255."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    magic = b"P6" if arr.ndim == 3 else b"P5"
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) BMP decode, pure stdlib+numpy:
    24-bit -> (h, w, 3) uint8 RGB; 8-bit paletted -> (h, w, 3) via the
    palette. Handles the 4-byte row padding, bottom-up AND top-down
    (negative height) row order, and BGR sample order — output is always
    row-major top-down RGB."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    h, top_down = abs(h_signed), h_signed < 0
    row_bytes = (w * bpp // 8 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        return np.ascontiguousarray(px)
    if bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(n_colors, 4)[:, 2::-1]  # BGRA entries -> RGB
        return np.ascontiguousarray(pal[rows[:, :w]])
    raise ValueError(f"{bpp}-bit BMP not supported")


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP
    (BITMAPINFOHEADER, 4-byte-padded rows)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + data


def decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/WAVE PCM decode -> int16 samples, shape (n,) mono or
    (n, channels). Supports PCM (format 1) at 8 or 16 bits; 8-bit
    samples (stored unsigned, 0..255) are recentred to int16 around 0
    so downstream stats see signed PCM either way. Malformed payloads
    raise ValueError (quarantine contract)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV without fmt/data chunk")
    audio_fmt, n_ch, _rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"unsupported WAV format {audio_fmt} (only PCM)")
    if n_ch < 1:
        raise ValueError("bad WAV channel count")
    if bits == 16:
        pcm = np.frombuffer(data[: len(data) - len(data) % (2 * n_ch)], dtype="<i2")
        pcm = pcm.astype(np.int16)
    elif bits == 8:
        pcm = (
            np.frombuffer(data[: len(data) - len(data) % n_ch], dtype=np.uint8)
            .astype(np.int16)
            - 128
        )
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    return pcm if n_ch == 1 else pcm.reshape(-1, n_ch)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 samples, (n,) or (n, channels) -> RIFF/WAVE PCM16 bytes."""
    arr = np.asarray(samples, dtype="<i2")
    n_ch = 1 if arr.ndim == 1 else arr.shape[1]
    data = arr.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * n_ch * 2, n_ch * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode for the formats parseable without media libs
    (BMP, binary PPM/PGM, baseline JPEG), dispatched on the magic
    bytes."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:1] == b"P" and payload[1:2] in (b"5", b"6"):
        return decode_ppm(payload)
    if payload[:2] == b"\xff\xd8":
        from gmql_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from gmql_spark.operators.png import decode_png

        return decode_png(payload)
    raise NotImplementedError(
        "only BMP, binary PPM/PGM, baseline JPEG and PNG decode without media libs"
    )


def decode_any(payload: bytes) -> np.ndarray:
    """Opt-in dispatch decoder: real decode for formats decode_image
    recognizes, the deterministic stand-in for everything else. A
    RECOGNIZED-but-malformed image still raises (ValueError) — corrupt
    data must not silently degrade to stub features."""
    b = bytes(payload)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return decode_wav(b)
    try:
        return decode_image(b)
    except NotImplementedError:
        return _fake_decode(b)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder: Callable[[bytes], np.ndarray] = _fake_decode,
) -> DataFrame:
    """payload -> fixed-dim float feature vector, Arrow-batched.

    The batch shape is the real contract: each mapInPandas batch holds
    many rows; decode runs per row inside numpy, features are pooled
    reductions (here: moment pooling over the decoded array)."""

    schema = f"{id_col} long, feature array<float>"

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = decoder(bytes(payload)).astype(np.float64)
                # moment-pool into `dim` buckets (deterministic)
                chunks = np.array_split(arr, dim)
                feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
                ids.append(mid)
            yield pd.DataFrame({id_col: ids, "feature": feats})

    return df.mapInPandas(_featurize, schema=schema)


def decode_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder: Callable[[bytes], np.ndarray] = decode_image,
) -> DataFrame:
    """Decode every payload and emit integer/exact per-image statistics
    (Arrow-batched mapInPandas): dimensions, channel count, the exact
    pixel-byte sum, and the md5 of the decoded array's canonical bytes
    (row-major top-down RGB). Integers/digests make the result
    bit-exactly checkable against pixels computed outside Spark — a
    true round-trip oracle for the decoder (row order, padding, and
    BGR/RGB handling all show up in the digest)."""
    schema = f"{id_col} long, width int, height int, channels int, px_sum long, px_md5 string"

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = decoder(bytes(payload))
                h, w = arr.shape[:2]
                ch = arr.shape[2] if arr.ndim == 3 else 1
                rows.append(
                    (
                        mid,
                        int(w),
                        int(h),
                        int(ch),
                        int(arr.astype(np.int64).sum()),
                        hashlib.md5(np.ascontiguousarray(arr).tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "channels", "px_sum", "px_md5"]
            )

    return df.mapInPandas(_stats, schema=schema)


def synth_image(seed_bytes: bytes, fmt: str) -> tuple[np.ndarray, bytes]:
    """Deterministic test image from a seed: pixels from
    PCG64(sha256(seed)), encoded as ``bmp``, ``ppm`` or ``jpeg``.
    Returns (pixels, encoded payload) so an oracle can compute expected
    stats from the PIXELS while the engine path goes
    pixels -> encode -> decode — exercising the full codec round trip.

    ``bmp``/``ppm``/``png`` (lossless codecs — identical pixels per
    seed, so ONE pixels-only oracle covers all three): random RGB, dims
    3..15 x 2..12; the PNG encoder cycles all five scanline filters.
    ``jpeg``: random GRAY 8×8-tile-constant mosaic, dims up to 40×32 —
    with the codec's DC quantization step of 8, block-constant images
    round-trip pixel-EXACTLY through the lossy pipeline (see
    ``jpeg.py`` module doc), so the same pixels-only oracle applies."""
    h8 = hashlib.sha256(seed_bytes).digest()
    if fmt == "jpeg":
        from gmql_spark.operators.jpeg import encode_jpeg

        px = synth_jpeg_pixels(seed_bytes)
        return px, encode_jpeg(px, restart_interval=2 if h8[10] % 2 else 0)
    rng = np.random.Generator(np.random.PCG64(int.from_bytes(h8[:8], "little")))
    w, h = 3 + h8[8] % 13, 2 + h8[9] % 11
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if fmt == "png":
        from gmql_spark.operators.png import encode_png

        return px, encode_png(px)
    return px, (encode_bmp(px) if fmt == "bmp" else encode_ppm(px))


def synth_jpeg_pixels(seed_bytes: bytes) -> np.ndarray:
    """Pixels of the deterministic jpeg test mosaic, WITHOUT running the
    codec — the single source of truth shared by ``synth_image`` (which
    then encodes) and the fixture oracle (tools/make_image_fixture.py,
    which must stay pixels-only). Keeping both callers on one helper
    means a constant change here can never silently desynchronize the
    engine path from the fixture expectations."""
    h8 = hashlib.sha256(seed_bytes).digest()
    rng = np.random.Generator(np.random.PCG64(int.from_bytes(h8[:8], "little")))
    w, h = 9 + h8[8] % 32, 8 + h8[9] % 25
    tiles = rng.integers(0, 256, size=(-(-h // 8), -(-w // 8)), dtype=np.uint8)
    return np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)[:h, :w]


def probe_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder: Callable[[bytes], np.ndarray] = _fake_decode,
) -> DataFrame:
    """Fill the typed meta struct from the payload (decoded shape)."""
    schema = f"{id_col} long, width int, height int, n_bytes long"

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = decoder(bytes(payload))
                rows.append((mid, int(len(arr) % 256), int(len(arr) // 256 + 1), len(payload)))
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "n_bytes"])

    return df.mapInPandas(_probe, schema=schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame timestamp
    (pure Catalyst explode; the decode of each frame would hang off the
    ``decoder`` hook in a real deployment)."""
    from pyspark.sql import functions as F

    return df.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
    )
