"""Pure stdlib(zlib)+numpy baseline PNG codec.

Scope: what a fixture/ingest path needs without media libraries —
bit depth 8, color types 0 (gray) / 2 (RGB) / 6 (RGBA), no interlace,
all five scanline filters (None/Sub/Up/Average/Paeth), multi-IDAT
streams. Malformed payloads raise ValueError (the multimodal layer's
quarantine contract: recognized-but-corrupt must never silently
degrade to stub features).

The encoder exists to make the decoder honestly testable: it cycles
the filter type per row (row % 5), so every filter path — including
Paeth's three-way predictor and Average's floor division — is
exercised by any image taller than four rows, and emits correct CRCs.

This is for synthesizing/validating test fixtures and small sidecar
images; a production media pipeline plugs a real codec into the same
``decoder=`` seam (``operators.multimodal``). The reference has no
media layer at all — this is beyond-parity surface. Spec: the public
PNG specification (RFC 2083 / W3C PNG).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a bpp-sized pixel vector; all
    operands int16 to avoid uint8 wraparound in the distance terms."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (h, w) uint8 gray or (h, w, ch) uint8 RGB/RGBA,
    row-major top-down."""
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        crc_raw = payload[pos + 8 + length : pos + 12 + length]
        if len(crc_raw) != 4 or struct.unpack(">I", crc_raw)[0] != (
            zlib.crc32(ctype + data) & 0xFFFFFFFF
        ):
            # recognized-but-corrupt must never silently degrade: a
            # bit-flipped filter byte with intact zlib framing would
            # otherwise decode to wrong pixels
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError(f"bad PNG IHDR length {length}")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 8 + length + 4
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, ctype_v, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if ctype_v not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype_v}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    if w <= 0 or h <= 0:
        raise ValueError("bad PNG dimensions")
    ch = _CHANNELS[ctype_v]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad PNG IDAT stream: {e}") from None
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel data size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = ch  # bytes per pixel at depth 8
    for i in range(h):
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=i * (1 + stride) + 1)
        ftype = raw[i * (1 + stride)]
        cur = row.copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride, bpp):
                cur[x : x + bpp] += cur[x - bpp : x]
        elif ftype == 2:  # Up
            cur += prev
        elif ftype == 3:  # Average
            cur[:bpp] += prev[:bpp] // 2
            for x in range(bpp, stride, bpp):
                cur[x : x + bpp] += (
                    (
                        cur[x - bpp : x].astype(np.uint16)
                        + prev[x : x + bpp].astype(np.uint16)
                    )
                    // 2
                ).astype(np.uint8)
        elif ftype == 4:  # Paeth
            cur[:bpp] += prev[:bpp]  # left/up-left are zero for first px
            for x in range(bpp, stride, bpp):
                cur[x : x + bpp] += _paeth(
                    cur[x - bpp : x], prev[x : x + bpp], prev[x - bpp : x]
                ).astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[i] = cur
        prev = cur
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w[, ch]) uint8 -> PNG bytes. Cycles the scanline filter per
    row (row % 5) so round-trip tests exercise every defilter path."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        ctype, ch = 0, 1
        flat = arr
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        ctype, ch = (2, 3) if arr.shape[2] == 3 else (6, 4)
        flat = arr.reshape(arr.shape[0], -1)
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, stride = flat.shape
    w = stride // ch
    bpp = ch
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for i in range(h):
        cur = flat[i]
        f = i % 5
        c16 = cur.astype(np.int16)
        left = np.zeros(stride, dtype=np.int16)
        left[bpp:] = c16[:-bpp]
        up = prev.astype(np.int16)
        upleft = np.zeros(stride, dtype=np.int16)
        upleft[bpp:] = up[:-bpp]
        if f == 0:
            enc = cur
        elif f == 1:
            enc = ((c16 - left) % 256).astype(np.uint8)
        elif f == 2:
            enc = ((c16 - up) % 256).astype(np.uint8)
        elif f == 3:
            enc = ((c16 - (left + up) // 2) % 256).astype(np.uint8)
        else:
            pred = _paeth(
                left.astype(np.uint8), up.astype(np.uint8), upleft.astype(np.uint8)
            ).astype(np.int16)
            enc = ((c16 - pred) % 256).astype(np.uint8)
        lines.append(f)
        lines.extend(enc.tobytes())
        prev = cur

    def chunk(ctype_b: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype_b
            + data
            + struct.pack(">I", zlib.crc32(ctype_b + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )
