"""Baseline sequential JPEG codec in pure stdlib+numpy.

The last multimodal format that previously fell back to the stub
decoder. This is a *correctness baseline*, not a performance codec: it
implements the baseline sequential JFIF process (SOF0) end to end —
marker parsing, DQT/DHT tables, interleaved MCU entropy decode with
byte destuffing and RSTn restarts, magnitude decoding, dezigzag,
dequantize, float IDCT, chroma upsampling, YCbCr→RGB — so the engine's
image plumbing (``multimodal.decode_stats`` etc.) runs REAL bytes for
JPEG payloads too. A production deployment swaps in a libjpeg-backed
``decoder=`` with the same signature; plans and schemas are identical.

The encoder exists to produce valid test payloads (and makes no
attempt at good compression): 8-bit, 4:4:4 or 4:2:0, fixed-length
canonical Huffman tables written into DHT (12 DC symbols at 4 bits,
162 AC symbols at 8 bits — any decoder reads them from the stream, so
spec Annex-K tables are not required), and a flat quantization table
with ``q[0] = 8``. That DC step makes block-constant images round-trip
pixel-EXACTLY (DC of a constant block is ``8·(v−128)``, an exact
multiple of the step; every AC quantizes to 0), which is what the
``image_decode`` gate's pixel-level oracle relies on — see
``multimodal.synth_image(fmt="jpeg")``.

Everything here derives from the public JPEG (ITU-T T.81) process;
no reference-repo counterpart exists (cited stub was
``multimodal.py:33``'s fake decoder).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal 8-point DCT-II matrix: F = C @ (X - 128) @ C.T gives the
# JPEG forward DCT scale (DC = 8*(mean-128)); inverse is C.T @ F @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.sqrt((1 if _k else 0.5) / 4.0) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16.0
        )

# flat quant table, DC step 8 (block-constant exact round trip)
_QTABLE = np.full(64, 16, dtype=np.int64)
_QTABLE[0] = 8

# canonical fixed-length Huffman tables (written into DHT, read back by
# any decoder): DC symbols 0..11 all at 4 bits; AC symbols — EOB, ZRL
# and every (run 0..15, size 1..10) pair — all at 8 bits
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _canonical_codes(bits_per_symbol: int, symbols):
    return {sym: (bits_per_symbol, i) for i, sym in enumerate(symbols)}


_DC_CODES = _canonical_codes(4, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(8, _AC_SYMBOLS)


def _dht_segment(table_class: int, table_id: int, bits_per_symbol: int, symbols) -> bytes:
    counts = [0] * 16
    counts[bits_per_symbol - 1] = len(symbols)
    body = bytes([(table_class << 4) | table_id]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, value-bits) of a coefficient: negatives use the
    one's-complement convention."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _fdct_quant(block: np.ndarray) -> np.ndarray:
    f = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    zz = f.reshape(64)[_ZZ]
    return np.round(zz / _QTABLE).astype(np.int64)


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")


def _rgb_to_ycc(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )


def encode_jpeg(
    px: np.ndarray, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 -> baseline JFIF bytes
    (4:4:4, or 4:2:0 when ``subsample`` and the input is color).
    ``restart_interval`` > 0 writes DRI + RSTn markers every N MCUs
    (exercises the decoder's restart resync path)."""
    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycc(px)
        y, cb, cr = (ycc[..., i] for i in range(3))
        if subsample:
            # box-average 2x2 chroma (pad odd dims by edge first)
            cpad_h, cpad_w = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            def down(c):
                c = np.pad(c, ((0, cpad_h - h), (0, cpad_w - w)), mode="edge")
                return c.reshape(cpad_h // 2, 2, cpad_w // 2, 2).mean(axis=(1, 3))
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = [
        _pad_to_blocks(p, mcus_y * s[1], mcus_x * s[0]) for p, s in zip(planes, samp)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(q) for q in _QTABLE)
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, (hi, vi) in enumerate(samp):
        sof += bytes([i + 1, (hi << 4) | vi, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, 4, _DC_SYMBOLS)
    out += _dht_segment(1, 0, 8, _AC_SYMBOLS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    dc_pred = [0] * ncomp
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                out += bw.flush()
                out += bytes([0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8])
                bw = _BitWriter()
                dc_pred = [0] * ncomp
            mcu_count += 1
            for ci, (hi, vi) in enumerate(samp):
                for by in range(vi):
                    for bx in range(hi):
                        r0 = (my * vi + by) * 8
                        c0 = (mx * hi + bx) * 8
                        zz = _fdct_quant(padded[ci][r0 : r0 + 8, c0 : c0 + 8])
                        diff = int(zz[0]) - dc_pred[ci]
                        dc_pred[ci] = int(zz[0])
                        size, bits = _magnitude(diff)
                        ln, code = _DC_CODES[size]
                        bw.write(code, ln)
                        if size:
                            bw.write(bits, size)
                        run = 0
                        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = _AC_CODES[0xF0]
                                bw.write(code, ln)
                                run -= 16
                            size, bits = _magnitude(v)
                            ln, code = _AC_CODES[(run << 4) | size]
                            bw.write(code, ln)
                            bw.write(bits, size)
                            run = 0
                        if last_nz < 63:
                            ln, code = _AC_CODES[0x00]  # EOB
                            bw.write(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("jpeg: entropy data exhausted mid-block")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_decode_table(counts, symbols):
    """Canonical Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JFIF decode -> (h, w) gray or (h, w, 3) RGB
    uint8. Raises ValueError on non-baseline (progressive etc.) or
    malformed streams — corrupt data must not degrade to stub output.
    Truncated streams surface as IndexError/struct.error from the raw
    byte reads; normalize them to the documented ValueError so the
    decode layer's recognized-but-malformed contract (``decode_any``
    quarantines on ValueError) holds for every corruption shape."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error, KeyError, ZeroDivisionError) as ex:
        # IndexError/struct.error: truncated byte reads; KeyError: scan
        # references an undefined quant/Huffman table id; ZeroDivision:
        # zero sampling factor in SOF — all are malformed-stream shapes
        raise ValueError(f"jpeg: truncated or malformed stream ({ex!r})") from ex


def _decode_jpeg(payload: bytes) -> np.ndarray:
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(comp_id, hi, vi, tq)])
    restart_interval = 0
    scan = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=off + 1
                ).astype(np.int64)
                off += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                counts = list(seg[off + 1 : off + 17])
                n = sum(counts)
                symbols = list(seg[off + 17 : off + 17 + n])
                htables[(tc, th)] = _build_decode_table(counts, symbols)
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            precision, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline sequential (SOF0/1) supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS: entropy data follows
            ns = seg[0]
            scan = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF)
                    for i in range(ns)]
            break
        # APPn / COM / others: skipped

    if frame is None or scan is None:
        raise ValueError("jpeg: missing SOF/SOS")
    h, w, comps = frame

    # split entropy stream on restart markers, destuff 0xFF00
    segments: list[bytes] = []
    cur = bytearray()
    while pos < len(data):
        b = data[pos]
        if b == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                pos += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                pos += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        pos += 1
    segments.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcus_y * vi * 8, mcus_x * hi * 8)) for cid, hi, vi, _ in comps
    }
    scan_by_cid = {s[0]: s for s in scan}

    seg_idx = 0
    reader = _BitReader(segments[0])
    dc_pred = {cid: 0 for cid, *_ in comps}
    mcu_in_interval = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_in_interval == restart_interval:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("jpeg: missing restart segment")
                reader = _BitReader(segments[seg_idx])
                dc_pred = {cid: 0 for cid, *_ in comps}
                mcu_in_interval = 0
            mcu_in_interval += 1
            for cid, hi, vi, tq in comps:
                _, td, ta = scan_by_cid[cid]
                q = qtables[tq]
                for by in range(vi):
                    for bx in range(hi):
                        sym = _huff_decode(reader, htables[(0, td)])
                        diff = _extend(reader.read_bits(sym), sym)
                        dc_pred[cid] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = dc_pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, htables[(1, ta)])
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("jpeg: AC index out of range")
                            size = rs & 0xF
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        block = np.zeros(64)
                        block[_ZZ] = zz * q
                        spatial = _C.T @ block.reshape(8, 8) @ _C + 128.0
                        r0 = (my * vi + by) * 8
                        c0 = (mx * hi + bx) * 8
                        planes[cid][r0 : r0 + 8, c0 : c0 + 8] = spatial

    # upsample to full grid (nearest/pixel replication), crop, color
    full = []
    for cid, hi, vi, _ in comps:
        p = planes[cid]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
