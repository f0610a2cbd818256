"""Pure-numpy PNG and WAV codec round trips + dispatch + quarantine.

No Spark needed: the codecs are plain functions; the Spark-side
plumbing they plug into is covered by the ``image_decode`` gate
(which routes doc_id % 4 == 3 through encode_png -> decode_png) and
the multimodal operator tests.
"""

from __future__ import annotations

import numpy as np
import pytest

from gmql_spark.operators.multimodal import decode_any, decode_wav, encode_wav
from gmql_spark.operators.png import decode_png, encode_png

RNG = np.random.Generator(np.random.PCG64(7))


@pytest.mark.parametrize(
    "shape",
    [
        (1, 1),  # gray single pixel
        (7, 3),  # gray, height > 5 => every filter type used
        (2, 9, 3),  # RGB short
        (11, 5, 3),  # RGB tall
        (6, 4, 4),  # RGBA
        (64, 64, 3),  # larger: many filter cycles
    ],
)
def test_png_round_trip(shape):
    px = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(px))
    assert back.shape == px.shape
    assert np.array_equal(back, px)


def test_png_gradient_exercises_predictors():
    # smooth gradients are the regime where Sub/Average/Paeth actually
    # predict well — a sign-error in any predictor shows immediately
    y, x = np.mgrid[0:40, 0:30]
    px = np.stack([(x * 3) % 256, (y * 5) % 256, (x + y) % 256], axis=-1).astype(
        np.uint8
    )
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_malformed_raises():
    px = RNG.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    good = encode_png(px)
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"garbage")
    with pytest.raises(ValueError):
        decode_png(good[:20])  # truncated chunk
    # corrupt the deflate stream body (well past the IHDR)
    bad = bytearray(good)
    bad[-10] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_wav_round_trip_mono_and_stereo():
    mono = RNG.integers(-32768, 32768, size=500, dtype=np.int16)
    assert np.array_equal(decode_wav(encode_wav(mono)), mono)
    stereo = RNG.integers(-32768, 32768, size=(300, 2), dtype=np.int16)
    back = decode_wav(encode_wav(stereo, sample_rate=44100))
    assert back.shape == (300, 2)
    assert np.array_equal(back, stereo)


def test_wav_8bit_recentred():
    import struct

    data = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + b"\x00"  # odd data chunk is word-padded
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert list(decode_wav(wav)) == [-128, 0, 127]


def test_wav_malformed_raises():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE")  # no chunks
    good = encode_wav(np.zeros(4, dtype=np.int16))
    with pytest.raises(ValueError):
        decode_wav(good[:-3])  # truncated data chunk
    # non-PCM format code
    bad = bytearray(good)
    bad[20] = 3  # fmt tag -> IEEE float
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_decode_any_dispatches_png_and_wav():
    px = RNG.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    assert np.array_equal(decode_any(encode_png(px)), px)
    pcm = RNG.integers(-1000, 1000, size=64, dtype=np.int16)
    assert np.array_equal(decode_any(encode_wav(pcm)), pcm)
    # unrecognized bytes still fall through to the deterministic stub
    stub = decode_any(b"\x00\x01\x02unknown-format")
    assert stub.dtype == np.uint8 and stub.size >= 64


def test_png_crc_mismatch_rejected():
    """A bit flip inside a chunk (CRC intact framing) must raise, not
    silently decode wrong pixels (quarantine contract)."""
    import numpy as np
    import pytest

    from gmql_spark.operators.png import decode_png, encode_png

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    payload = bytearray(encode_png(img))
    # flip one bit inside the IDAT payload (leave length/type/CRC bytes)
    idx = payload.index(b"IDAT") + 6
    payload[idx] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(payload))
