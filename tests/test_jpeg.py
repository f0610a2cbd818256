"""Pure-numpy baseline JPEG codec tests (gmql_spark/operators/jpeg.py).

Three oracle strategies, since no external JPEG library exists in this
environment:

1. EXACT round trips by construction: block-constant gray images with
   the codec's DC quantization step of 8 survive the lossy pipeline
   pixel-exactly (module doc in jpeg.py derives why).
2. A hand-assembled bitstream using the published ITU-T T.81 Annex K
   luminance DC Huffman table — built bit-by-bit in the test from
   spec-known code values, NOT by our encoder — so the decoder's
   canonical-Huffman construction for variable-length tables is
   checked against the spec, not against itself.
3. Bounded-error checks for genuinely lossy paths (quantization on
   smooth images, 4:2:0 chroma subsampling).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gmql_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _mosaic(rng, th, tw, h, w):
    tiles = rng.integers(0, 256, size=(th, tw), dtype=np.uint8)
    return np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)[:h, :w]


def test_block_constant_gray_exact_round_trip():
    rng = np.random.Generator(np.random.PCG64(11))
    for h, w in [(8, 8), (30, 37), (8, 40), (25, 9), (1, 1), (7, 16)]:
        px = _mosaic(rng, -(-h // 8), -(-w // 8), h, w)
        dec = decode_jpeg(encode_jpeg(px))
        assert dec.shape == (h, w)
        assert np.array_equal(dec, px)


def test_restart_markers_exact_round_trip():
    rng = np.random.Generator(np.random.PCG64(12))
    px = _mosaic(rng, 5, 7, 40, 53)
    for ri in (1, 2, 3, 9, 100):
        payload = encode_jpeg(px, restart_interval=ri)
        if ri < 35:  # 5x7 MCUs -> RSTn actually present
            assert b"\xff\xd0" in payload or b"\xff\xd1" in payload
        assert np.array_equal(decode_jpeg(payload), px)


def test_rgb_444_block_constant_within_one():
    """RGB constant blocks: Y/Cb/Cr are constant but non-integer, so
    the rounded DC introduces at most 0.5 in DCT space -> off-by-one
    max after the uint8 round."""
    rng = np.random.Generator(np.random.PCG64(13))
    tiles = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    px = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)[:20, :27]
    dec = decode_jpeg(encode_jpeg(px))
    assert dec.shape == px.shape
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 1


def test_rgb_420_macroblock_constant_within_one():
    rng = np.random.Generator(np.random.PCG64(14))
    tiles = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    px = np.repeat(np.repeat(tiles, 16, axis=0), 16, axis=1)[:29, :41]
    dec = decode_jpeg(encode_jpeg(px, subsample=True))
    assert dec.shape == px.shape
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 1


def test_smooth_gradient_lossy_but_close():
    y, x = np.mgrid[0:48, 0:64]
    px = ((x * 3 + y * 2) % 256).astype(np.uint8)
    # a smooth ramp concentrates energy in low-frequency coefficients;
    # with AC step 16 the reconstruction stays within a few levels
    dec = decode_jpeg(encode_jpeg(px))
    assert np.abs(dec.astype(int) - px.astype(int)).mean() < 6.0


def test_annex_k_dc_table_hand_assembled_stream():
    """Two-block gray stream entropy-coded BY HAND with the published
    Annex K luminance DC table (ITU-T T.81 Table K.3: bits
    [0,1,5,1,1,1,1,1,1,0,...], symbols 0..11 -> canonical codes
    cat0='00', cat1='010' .. cat5='110', cat6='1110', ...) and a minimal AC
    table holding only EOB. Our encoder never emits variable-length
    tables, so this pins the decoder's canonical-Huffman build to the
    spec independently."""
    qt = bytes([8] + [16] * 63)  # zigzag DQT, DC step 8
    dc_bits = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
    dc_syms = bytes(range(12))
    ac_bits = bytes([0, 1] + [0] * 14)  # single symbol at length 2
    ac_syms = bytes([0x00])  # EOB -> canonical code '00'

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qt
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 12) + b"\x00" + dc_bits + dc_syms
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1) + b"\x10" + ac_bits + ac_syms
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # block 1: DC diff +25 -> category 5, Annex-K code 110, value
    # bits 11001; EOB 00.  block 2: diff -3 -> category 2, code 011,
    # value bits = one's complement form of -3 = 00; EOB 00.
    bitstr = "110" + "11001" + "00" + "011" + "00" + "00"
    bitstr += "1" * (-len(bitstr) % 8)  # pad with 1s per spec
    out += int(bitstr, 2).to_bytes(len(bitstr) // 8, "big")
    out += b"\xff\xd9"

    dec = decode_jpeg(bytes(out))
    assert dec.shape == (8, 16)
    # DC=25 -> dequant 200 -> spatial 200/8+128 = 153; then 25-3=22 -> 150
    assert np.array_equal(dec[:, :8], np.full((8, 8), 153, dtype=np.uint8))
    assert np.array_equal(dec[:, 8:], np.full((8, 8), 150, dtype=np.uint8))


def test_decoder_rejects_unsupported_and_corrupt():
    rng = np.random.Generator(np.random.PCG64(15))
    px = _mosaic(rng, 2, 2, 16, 16)
    good = encode_jpeg(px)

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # progressive (SOF2) must refuse, not garble
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    # truncated entropy stream: loud, never partial output
    cut = good[: len(good) - (len(good) - good.find(b"\xff\xda")) // 2]
    with pytest.raises(ValueError):
        decode_jpeg(cut)
    # 16-bit quant tables unsupported
    hdr = bytearray(good)
    dqt = hdr.find(b"\xff\xdb")
    hdr[dqt + 4] = 0x10  # Pq=1
    with pytest.raises(ValueError):
        decode_jpeg(bytes(hdr))


def test_decode_image_dispatches_jpeg_magic():
    from gmql_spark.operators.multimodal import decode_image, synth_image

    px, payload = synth_image(b"jpeg dispatch seed", "jpeg")
    assert payload[:2] == b"\xff\xd8"
    assert np.array_equal(decode_image(payload), px)


def test_synth_image_jpeg_exact_by_construction():
    for i in range(20):
        from gmql_spark.operators.multimodal import synth_image

        px, payload = synth_image(f"synth {i}".encode(), "jpeg")
        dec = decode_jpeg(payload)
        assert dec.shape == px.shape
        assert np.array_equal(dec, px)


def test_decoder_skips_app_and_com_segments():
    rng = np.random.Generator(np.random.PCG64(16))
    px = _mosaic(rng, 2, 3, 16, 24)
    good = encode_jpeg(px)
    # splice an APP1 (Exif-style) and a COM segment right after SOI
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + 10) + b"Exif\x00\x00abcd"
    com = b"\xff\xfe" + struct.pack(">H", 2 + 5) + b"hello"
    spliced = good[:2] + app1 + com + good[2:]
    assert np.array_equal(decode_jpeg(spliced), px)
