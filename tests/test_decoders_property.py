"""Property-based tests (hypothesis) for the pure-python media decoders:
random dimensions, color types, filter choices, endianness and strip splits
round-trip bit-exactly through independent reference encoders. These run
without Spark — decode is plain numpy — so hundreds of cases stay cheap."""

from __future__ import annotations

import struct
import zlib

import numpy as np
from hypothesis import given, settings, strategies as st

from arrow_parquet_logs_spark.operators import multimodal as M

from tests.test_operators import _encode_png_py, _encode_tiff_py


def _encode_bmp_py(px):
    """Reference BMP writer: 24-bit, bottom-up, BGR, 4-byte row padding."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    raster = b""
    for y in range(h - 1, -1, -1):
        row = px[y, :, ::-1].astype(np.uint8).tobytes()
        raster += row + b"\0" * (stride - len(row))
    off = 14 + 40
    header = (
        b"BM" + struct.pack("<IHHI", off + len(raster), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    )
    return header + raster


def _encode_ppm_py(px):
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    ct=st.sampled_from([0, 2, 6]),
    seed=st.integers(0, 2**32 - 1),
    data=st.data(),
)
def test_png_roundtrip_random(w, h, ct, seed, data):
    rng = np.random.default_rng(seed)
    ch = {0: 1, 2: 3, 6: 4}[ct]
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.int64)
    filters = data.draw(st.lists(st.integers(0, 4), min_size=1, max_size=h))
    gw, gh, out = M._decode_png(_encode_png_py(px, ct, filters))
    assert (gw, gh) == (w, h)
    if ch == 1:
        exp = np.repeat(px, 3, axis=2)
    elif ch == 4:
        exp = px[:, :, :3]
    else:
        exp = px
    assert (out.astype(np.int64) == exp).all()


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    endian=st.sampled_from(["<", ">"]),
    strips=st.integers(1, 5),
    gray=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_tiff_roundtrip_random(w, h, endian, strips, gray, seed):
    rng = np.random.default_rng(seed)
    ch = 1 if gray else 3
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.int64)
    gw, gh, out = M._decode_tiff(
        _encode_tiff_py(px, endian, min(strips, h), gray=gray)
    )
    assert (gw, gh) == (w, h)
    exp = np.repeat(px, 3, axis=2) if gray else px
    assert (out.astype(np.int64) == exp).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 64),
    channels=st.sampled_from([1, 2]),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**32 - 1),
)
def test_wav_roundtrip_random(n, channels, sr, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n * channels, dtype=np.int64)
    data = np.asarray(samples, dtype="<i2").tobytes()
    buf = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sr,
                                sr * channels * 2, channels * 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    got_sr, got = M._decode_wav(buf)
    assert got_sr == sr
    s = samples.astype(np.int64)
    if channels == 2:
        exp = ((s.reshape(-1, 2)[:, 0] + s.reshape(-1, 2)[:, 1]) >> 1).astype(np.int16)
    else:
        exp = s.astype(np.int16)
    assert got.tolist() == exp.tolist()


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 10),
    h=st.integers(1, 10),
    seed=st.integers(0, 2**32 - 1),
)
def test_same_pixels_decode_identically_across_formats(w, h, seed):
    """The four real image decoders must agree bit-for-bit on the same
    pixel content — PPM raster order, BMP bottom-up BGR un-flip, PNG
    inflate/unfilter and TIFF strip assembly all normalize to one RGB
    array (any disagreement would silently split perceptual-hash
    duplicates across formats)."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64)
    outs = [
        M._decode_ppm(_encode_ppm_py(px)),
        M._decode_bmp(_encode_bmp_py(px)),
        M._decode_png(_encode_png_py(px, 2, [0, 1, 2, 3, 4])),
        M._decode_tiff(_encode_tiff_py(px, "<", 1)),
    ]
    for gw, gh, out in outs:
        assert (gw, gh) == (w, h)
        assert (out.astype(np.int64) == px).all()
