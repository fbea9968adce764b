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


# ---- GIF: reference LZW encoder + round-trip properties --------------------


def _lzw_encode_py(indices: bytes, min_code_size: int) -> bytes:
    """Reference GIF LZW encoder (LSB-first, variable width, 4096-entry
    dictionary) — exercises the decoder's real dictionary-growth path."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    out = bytearray()
    acc = acc_bits = 0

    def emit(code, w):
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += w
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    emit(clear, width)
    prev = b""
    for p in bytes(indices):
        cur = prev + bytes([p])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        prev = bytes([p])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _encode_gif_py(frames, palette, w, h, delays=None, interlace=False, min_code_size=None):
    """Reference GIF89a writer: frames are HxW uint8 index arrays resolved
    through one global color table."""
    npal = len(palette)
    size_field = max(0, (max(npal, 2) - 1).bit_length() - 1)
    entries = 2 << size_field
    pal = np.zeros((entries, 3), np.uint8)
    pal[:npal] = palette
    if min_code_size is None:
        min_code_size = max(2, (entries - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += pal.tobytes()
    for k, fr in enumerate(frames):
        if delays is not None:
            out += bytes([0x21, 0xF9, 4, 0]) + struct.pack("<H", delays[k]) + bytes([0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        idx = fr
        if interlace:
            order = [*range(0, h, 8), *range(4, h, 8), *range(2, h, 4), *range(1, h, 2)]
            idx = fr[order]
        data = _lzw_encode_py(idx.reshape(-1).astype(np.uint8).tobytes(), min_code_size)
        out += bytes([min_code_size])
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 48),
    h=st.integers(1, 48),
    npal=st.integers(2, 256),
    interlace=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_gif_roundtrip_random(w, h, npal, interlace, seed):
    """Random palettes/dims/interlacing round-trip bit-exactly — large
    rasters push the LZW dictionary through several code-width growths,
    the path the Catalyst-synthesized registry payloads can't reach."""
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
    img = rng.integers(0, npal, (h, w)).astype(np.uint8)
    gw, gh, out = M._decode_gif(_encode_gif_py([img], palette, w, h, interlace=interlace))
    assert (gw, gh) == (w, h)
    assert (out == palette[img]).all()


def test_gif_lzw_dictionary_growth_kwkwk():
    """A long two-symbol run forces repeated KwKwK self-reference codes and
    dictionary growth past several width boundaries."""
    img = np.tile(np.array([0, 0, 1, 1], np.uint8), 700).reshape(40, 70)
    palette = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    _, _, out = M._decode_gif(_encode_gif_py([img], palette, 70, 40, min_code_size=2))
    assert (out == palette[img]).all()


def test_gif_multiframe_delays_and_info():
    rng = np.random.default_rng(3)
    palette = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    f1 = rng.integers(0, 16, (5, 7)).astype(np.uint8)
    f2 = rng.integers(0, 16, (5, 7)).astype(np.uint8)
    buf = _encode_gif_py([f1, f2], palette, 7, 5, delays=[12, 34])
    sw, sh, frames = M._gif_frames(buf)
    assert (sw, sh) == (7, 5)
    assert [d for d, _ in frames] == [12, 34]
    assert (frames[0][1] == palette[f1]).all()
    assert (frames[1][1] == palette[f2]).all()


def test_gif_error_paths():
    import pytest

    with pytest.raises(ValueError):
        M._decode_gif(b"NOTAGIF")
    palette = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    img = np.zeros((2, 2), np.uint8)
    good = _encode_gif_py([img], palette, 2, 2)
    with pytest.raises(ValueError):
        M._decode_gif(good[:20])  # truncated before image data
    # palette index out of range: 4-entry table, index 3 valid, but force a
    # 2-entry logical palette with an index pointing past it
    img_bad = np.array([[0, 3], [1, 2]], np.uint8)
    buf = _encode_gif_py([img_bad], palette, 2, 2)  # pads table to 4 entries
    # padded entries are zeros, decode succeeds; now corrupt the LZW stream
    with pytest.raises(ValueError):
        M._lzw_decode_gif(b"\xff\xff\xff", 8, 100)  # codes out of range


# ---- JPEG: reference bit-writer encoder + coefficient-level properties -----

_STD_DC_L = (
    bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_STD_AC_L = (
    bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]),
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13,
        0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08, 0x23, 0x42,
        0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A,
        0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35,
        0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67,
        0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84,
        0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3,
        0xB4, 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)


def _huff_codes_py(counts, symbols):
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriterPy:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)
        return bytes(self.out)


def _mag_bits_py(v):
    t = abs(v).bit_length()
    if t == 0:
        return 0, 0
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _encode_jpeg_blocks_py(bw, blocks, dc_codes, ac_codes, pred):
    zz = M._JPEG_ZIGZAG
    for coef in blocks:
        zzc = [int(coef[zz[i]]) for i in range(64)]
        t, bits = _mag_bits_py(zzc[0] - pred)
        ln, code = dc_codes[t]
        bw.write(code, ln)
        bw.write(bits, t)
        pred = zzc[0]
        last_nz = max([i for i in range(1, 64) if zzc[i]], default=0)
        run = 0
        for i in range(1, last_nz + 1):
            if zzc[i] == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                bw.write(code, ln)
                run -= 16
            t, bits = _mag_bits_py(zzc[i])
            ln, code = ac_codes[(run << 4) | t]
            bw.write(code, ln)
            bw.write(bits, t)
            run = 0
        if last_nz < 63:
            ln, code = ac_codes[0x00]
            bw.write(code, ln)
    return pred


def _encode_jpeg_py(w, h, comps, qtables, blocks_by_comp, restart_interval=0):
    """Reference baseline-JPEG writer over chosen QUANTIZED coefficients
    (raster order): standard Annex-K luminance Huffman tables for every
    component, MCU interleaving, optional restart markers."""
    zz = M._JPEG_ZIGZAG
    out = bytearray(b"\xff\xd8")
    for tq, q in qtables.items():
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(q[zz[i]]) for i in range(64))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w, len(comps))
    for cid, hs, vs, tq in comps:
        out += bytes([cid, (hs << 4) | vs, tq])
    for tc, (counts, symbols) in ((0, _STD_DC_L), (1, _STD_AC_L)):
        out += (
            b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(symbols))
            + bytes([tc << 4]) + counts + symbols
        )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, *_ in comps:
        out += bytes([cid, 0x00])
    out += bytes([0, 63, 0])
    dc_codes = _huff_codes_py(*_STD_DC_L)
    ac_codes = _huff_codes_py(*_STD_AC_L)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    preds = {c[0]: 0 for c in comps}
    idx = {c[0]: 0 for c in comps}
    bw = _BitWriterPy()
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            out += bw.flush() + bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriterPy()
            preds = {c[0]: 0 for c in comps}
        for cid, hs, vs, tq in comps:
            nb = hs * vs
            preds[cid] = _encode_jpeg_blocks_py(
                bw, blocks_by_comp[cid][idx[cid] : idx[cid] + nb], dc_codes, ac_codes,
                preds[cid],
            )
            idx[cid] += nb
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _ref_idct_py(coef64, q64):
    """Independent O(n⁴) direct cosine-sum IDCT (ITU T.81 A.3.3 verbatim) —
    a different code path from the decoder's basis-matrix product."""
    F2 = np.array(
        [coef64[i] * q64[i] for i in range(64)], dtype=np.float64
    ).reshape(8, 8)
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv / 4.0 * F2[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s
    return out


def _rand_block(rng, dc_range=200, n_ac=8, ac_range=80):
    c = np.zeros(64, dtype=np.int64)
    c[0] = int(rng.integers(-dc_range, dc_range))
    nz = rng.choice(np.arange(1, 64), size=n_ac, replace=False)
    c[nz] = rng.integers(-ac_range, ac_range, n_ac)
    return c


@settings(max_examples=15, deadline=None)
@given(
    bw_=st.integers(1, 3),
    bh_=st.integers(1, 3),
    seed=st.integers(0, 2**32 - 1),
    restart=st.sampled_from([0, 1, 2]),
)
def test_jpeg_gray_random_coefficients(bw_, bh_, seed, restart):
    """Random quantized coefficients (DC + sparse AC) through the full
    Huffman/zigzag/dequant/IDCT chain — expected pixels from an
    independent direct cosine-sum, checked bit-exactly (both sides use
    float64 and round-half-up, so disagreement means a real decode bug,
    not rounding noise). Restart intervals reset DC prediction."""
    rng = np.random.default_rng(seed)
    w, h = bw_ * 8, bh_ * 8
    blocks = [_rand_block(rng) for _ in range(bw_ * bh_)]
    q = rng.integers(1, 30, 64).astype(np.int64)
    buf = _encode_jpeg_py(w, h, [(1, 1, 1, 0)], {0: q}, {1: blocks}, restart_interval=restart)
    gw, gh, px = M._decode_jpeg(buf)
    assert (gw, gh) == (w, h)
    expected = np.zeros((h, w))
    for m, c in enumerate(blocks):
        my, mx = divmod(m, bw_)
        expected[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = _ref_idct_py(c, q)
    expg = np.clip(np.floor(expected + 128.5), 0, 255).astype(np.uint8)
    assert (px[:, :, 0] == expg).all()
    assert (px[:, :, 1] == expg).all() and (px[:, :, 2] == expg).all()


@settings(max_examples=10, deadline=None)
@given(
    sub=st.sampled_from([(1, 1), (2, 1), (2, 2)]),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_color_subsampling(sub, seed):
    """3-component YCbCr at 4:4:4 / 4:2:2 / 4:2:0: MCU interleaving,
    nearest-neighbor chroma upsampling, and the JFIF color transform all
    checked bit-exactly against an independent per-plane reference."""
    rng = np.random.default_rng(seed)
    hs, vs = sub
    w, h = 8 * hs, 8 * vs  # one MCU
    yb = [_rand_block(rng, 100, 5, 50) for _ in range(hs * vs)]
    cbb = [_rand_block(rng, 60, 3, 30)]
    crb = [_rand_block(rng, 60, 3, 30)]
    q0 = np.full(64, 2, np.int64)
    q1 = np.full(64, 3, np.int64)
    buf = _encode_jpeg_py(
        w, h,
        [(1, hs, vs, 0), (2, 1, 1, 1), (3, 1, 1, 1)],
        {0: q0, 1: q1},
        {1: yb, 2: cbb, 3: crb},
    )
    gw, gh, px = M._decode_jpeg(buf)
    assert (gw, gh) == (w, h)
    yplane = np.zeros((h, w))
    for m, c in enumerate(yb):
        my, mx = divmod(m, hs)
        yplane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = _ref_idct_py(c, q0)
    cbp = _ref_idct_py(cbb[0], q1)
    crp = _ref_idct_py(crb[0], q1)
    yi = np.arange(h) // vs
    xi = np.arange(w) // hs
    cb_up = cbp[yi][:, xi]
    cr_up = crp[yi][:, xi]
    Y = yplane + 128.0
    r = Y + 1.402 * cr_up
    g = Y - 0.344136 * cb_up - 0.714136 * cr_up
    b = Y + 1.772 * cb_up
    expc = np.clip(np.floor(np.stack([r, g, b], 2) + 0.5), 0, 255).astype(np.uint8)
    assert (px == expc).all()


def test_jpeg_error_paths():
    import pytest

    with pytest.raises(ValueError):
        M._decode_jpeg(b"notajpeg")
    q = np.ones(64, np.int64)
    blocks = [_rand_block(np.random.default_rng(0))]
    good = _encode_jpeg_py(8, 8, [(1, 1, 1, 0)], {0: q}, {1: blocks})
    # progressive SOF2 must raise loudly, not mis-decode
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        M._decode_jpeg(progressive)
    # truncated entropy data
    with pytest.raises(ValueError):
        M._decode_jpeg(good[:-6])


def test_jpeg_through_spark_pipeline(spark):
    """decode_media over real JPEG payloads end to end (format='jpeg' is in
    RAW_DECODABLE: no allow_fake)."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    q = rng.integers(1, 20, 64).astype(np.int64)
    rows = []
    expected = {}
    for i in range(6):
        blocks = [_rand_block(rng) for _ in range(2)]
        buf = _encode_jpeg_py(16, 8, [(1, 1, 1, 0)], {0: q}, {1: blocks})
        rows.append((i, bytearray(buf)))
        exp = np.zeros((8, 16))
        for m, c in enumerate(blocks):
            exp[:, m * 8 : m * 8 + 8] = _ref_idct_py(c, q)
        g = np.clip(np.floor(exp + 128.5), 0, 255).astype(np.int64)
        expected[i] = float((1000 * g.sum()) / (1000 * 255 * 16 * 8))
    df = spark.createDataFrame(rows, "doc_id long, raw binary")
    media = M.attach_media(df, "raw", "image", "jpeg")
    out = {r.id: r for r in M.decode_media(media, id_col="doc_id").collect()}
    for i in range(6):
        assert (out[i].width, out[i].height, out[i].n_frames) == (16, 8, 1)
        assert out[i].mean_luma == expected[i]


def test_gif_through_spark_pipeline(spark):
    """decode_media + resize_media + gif_animation_info over real GIF
    payloads end to end."""
    rng = np.random.default_rng(13)
    palette = rng.integers(0, 256, (64, 3)).astype(np.uint8)
    rows = []
    exp_luma = {}
    for i in range(5):
        img = rng.integers(0, 64, (6, 4)).astype(np.uint8)
        f2 = rng.integers(0, 64, (6, 4)).astype(np.uint8)
        buf = _encode_gif_py([img, f2], palette, 4, 6, delays=[10 + i, 20])
        rows.append((i, bytearray(buf)))
        tot = 0
        for fr in (img, f2):
            px = palette[fr].astype(np.int64)
            tot += int((299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]).sum())
        exp_luma[i] = tot / (1000 * 255 * 48)
    df = spark.createDataFrame(rows, "doc_id long, raw binary")
    media = M.attach_media(df, "raw", "video", "gif")
    dec = {r.id: r for r in M.decode_media(media, id_col="doc_id").collect()}
    for i in range(5):
        assert (dec[i].width, dec[i].height, dec[i].n_frames) == (4, 6, 2)
        assert dec[i].mean_luma == exp_luma[i]
    info = {r.doc_id: r for r in M.gif_animation_info(media, id_col="doc_id").collect()}
    for i in range(5):
        assert info[i].n_frames == 2
        assert info[i].duration_ms == (10 + i + 20) * 10
        assert info[i].mean_luma == exp_luma[i]
    # non-GIF formats stay gated
    import pytest

    other = M.attach_media(
        spark.createDataFrame([(9, bytearray(b"x"))], "doc_id long, raw binary"),
        "raw", "video", "mp4",
    )
    with pytest.raises(NotImplementedError):
        M.gif_animation_info(other, id_col="doc_id")


# ---- audio: G.711 companding + AIFF container ------------------------------


def _ulaw_ref_py(b):
    """Independent μ-law expansion (classic C implementation transcribed)."""
    u = ~b & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw_ref_py(b):
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def test_g711_tables_match_reference():
    ut, at = M._ulaw_table(), M._alaw_table()
    for b in range(256):
        assert ut[b] == _ulaw_ref_py(b)
        assert at[b] == _alaw_ref_py(b)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(0, 64),
    channels=st.sampled_from([1, 2]),
    law=st.sampled_from([6, 7]),
    seed=st.integers(0, 2**32 - 1),
)
def test_g711_wav_roundtrip_random(n, channels, law, seed):
    rng = np.random.default_rng(seed)
    data = bytes(rng.integers(0, 256, n * channels, dtype=np.int64).tolist())
    buf = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, law, channels, 8000,
                                8000 * channels, channels, 8)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    sr, s = M._decode_wav(buf)
    ref = _alaw_ref_py if law == 6 else _ulaw_ref_py
    lin = np.array([ref(b) for b in data], dtype=np.int64)
    if channels == 2:
        exp = (lin.reshape(-1, 2).sum(axis=1) >> 1).astype(np.int16)
    else:
        exp = lin.astype(np.int16)
    assert sr == 8000 and s.tolist() == exp.tolist()


def _ext80_py(rate):
    e = rate.bit_length() - 1
    return struct.pack(">HQ", 16383 + e, rate << (63 - e))


def _encode_aiff_py(samples, sr, channels=1, ssnd_offset=0):
    sd = np.asarray(samples, dtype=np.int64).astype(">i2").tobytes()
    comm = struct.pack(">HIH", channels, len(samples) // channels, 16) + _ext80_py(sr)
    ssnd = struct.pack(">II", ssnd_offset, 0) + b"\x00" * ssnd_offset + sd
    return (
        b"FORM" + struct.pack(">I", 4 + 8 + len(comm) + 8 + len(ssnd)) + b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(0, 64),
    channels=st.sampled_from([1, 2]),
    sr=st.sampled_from([8000, 22050, 44100, 48000]),
    offset=st.sampled_from([0, 4]),
    seed=st.integers(0, 2**32 - 1),
)
def test_aiff_roundtrip_random(n, channels, sr, offset, seed):
    """Big-endian PCM + 80-bit extended-float rate + SSND offset skip all
    round-trip; stereo downmix matches the WAV contract exactly."""
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, n * channels, dtype=np.int64)
    got_sr, got = M._decode_aiff(_encode_aiff_py(samples, sr, channels, offset))
    assert got_sr == sr
    if channels == 2:
        exp = (samples.reshape(-1, 2).sum(axis=1) >> 1).astype(np.int16)
    else:
        exp = samples.astype(np.int16)
    assert got.tolist() == exp.tolist()


def test_audio_error_paths():
    import pytest

    with pytest.raises(ValueError):
        M._decode_aiff(b"FORMxxxxWAVE")
    with pytest.raises(ValueError):
        M._decode_wav(
            b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)  # float PCM
            + b"data" + struct.pack("<I", 0)
        )


# ---- TIFF: LZW / PackBits compression + predictor --------------------------

from tests.test_operators import _packbits_encode_py, _tiff_lzw_encode_py


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    endian=st.sampled_from(["<", ">"]),
    strips=st.integers(1, 4),
    gray=st.booleans(),
    compression=st.sampled_from([1, 5, 8, 32773, 32946]),
    predictor=st.sampled_from([1, 2]),
    seed=st.integers(0, 2**32 - 1),
)
def test_tiff_compressed_roundtrip_random(w, h, endian, strips, gray, compression, predictor, seed):
    """LZW (MSB-first early-change) and PackBits strips, with and without
    the horizontal-differencing predictor, across endianness and strip
    splits — all byte-exact through the independent reference encoder."""
    rng = np.random.default_rng(seed)
    ch = 1 if gray else 3
    # low-entropy rasters so PackBits/LZW hit real runs and dictionary reuse
    px = (rng.integers(0, 5, size=(h, w, ch), dtype=np.int64) * 51) % 256
    buf = _encode_tiff_py(px, endian, min(strips, h), gray=gray,
                          compression=compression, predictor=predictor)
    gw, gh, out = M._decode_tiff(buf)
    assert (gw, gh) == (w, h)
    exp = np.repeat(px, 3, axis=2) if gray else px
    assert (out.astype(np.int64) == exp).all()


def test_tiff_lzw_dictionary_growth():
    """A raster long enough to push the TIFF LZW table past the 511/1023
    early-change boundaries (where GIF-style late change would desync)."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(40, 40, 3), dtype=np.int64)
    buf = _encode_tiff_py(px, "<", 1, compression=5)
    gw, gh, out = M._decode_tiff(buf)
    assert (out.astype(np.int64) == px).all()


def test_packbits_reference_cases():
    """The canonical Apple PackBits worked example round-trips, and the
    128 no-op control byte is skipped."""
    data = bytes([0xAA] * 3 + [0x80, 0x00, 0x2A] + [0xAA] * 4 + [0x80, 0x00]
                 + [0x2A, 0x22] + [0xAA] * 9)
    enc = _packbits_encode_py(data)
    assert M._packbits_decode(enc, len(data)) == data
    assert M._packbits_decode(b"\x80" + enc, len(data)) == data  # leading no-op


# ---- FLAC: reference encoder + lossless round-trip properties --------------


class _FlacBW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v, nbits):
        v &= (1 << nbits) - 1
        self.acc = (self.acc << nbits) | v
        self.n += nbits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.w(0, 8 - self.n)

    def bytes(self):
        assert self.n == 0
        return bytes(self.out)


def _flac_rice_write(bw, resid, param):
    for e in resid:
        zz = (-e) * 2 - 1 if e < 0 else e * 2
        q, r = zz >> param, zz & ((1 << param) - 1)
        for _ in range(q):
            bw.w(0, 1)
        bw.w(1, 1)
        if param:
            bw.w(r, param)


def _flac_write_subframe(bw, samples, bps, kind, order=2, porder=0, param=8,
                         lpc_coefs=None, lpc_shift=0, lpc_prec=12, wasted=0,
                         escape_parts=frozenset()):
    n = len(samples)
    bw.w(0, 1)
    eff = bps - wasted
    s2 = [s >> wasted for s in samples] if wasted else list(samples)

    def wasted_flag():
        bw.w(1 if wasted else 0, 1)
        if wasted:
            for _ in range(wasted - 1):
                bw.w(0, 1)
            bw.w(1, 1)

    if kind == "constant":
        bw.w(0, 6)
        wasted_flag()
        bw.w(s2[0], eff)
        return
    if kind == "verbatim":
        bw.w(1, 6)
        wasted_flag()
        for s in s2:
            bw.w(s, eff)
        return
    if kind == "fixed":
        bw.w(8 + order, 6)
        wasted_flag()
        for s in s2[:order]:
            bw.w(s, eff)
        coefs = M._FLAC_FIXED_COEFFS[order]
        resid = [
            s2[i] - sum(c * s2[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, n)
        ]
    else:  # lpc
        coefs = lpc_coefs
        order = len(coefs)
        bw.w(32 + order - 1, 6)
        wasted_flag()
        for s in s2[:order]:
            bw.w(s, eff)
        bw.w(lpc_prec - 1, 4)
        bw.w(lpc_shift, 5)
        for c in coefs:
            bw.w(c, lpc_prec)
        resid = [
            s2[i] - (sum(c * s2[i - 1 - j] for j, c in enumerate(coefs)) >> lpc_shift)
            for i in range(order, n)
        ]
    bw.w(0, 2)  # 4-bit rice parameters
    bw.w(porder, 4)
    idx = 0
    for p in range(1 << porder):
        cnt = (n >> porder) - (order if p == 0 else 0)
        part = resid[idx : idx + cnt]
        idx += cnt
        if p in escape_parts:
            bw.w(15, 4)
            raw_bits = max((abs(e).bit_length() + 1 for e in part), default=1)
            bw.w(raw_bits, 5)
            for e in part:
                bw.w(e, raw_bits)
        else:
            bw.w(param, 4)
            _flac_rice_write(bw, part, param)


_FLAC_BS_CODES = {192: 1, 576: 2, 256: 8, 512: 9}


def _encode_flac_py(channel_samples, sr=8000, bps=16, block_size=192,
                    subframe_kwargs=None, ch_mode="independent"):
    """Reference FLAC encoder for tests (8 kHz / 16-bit headers): STREAMINFO,
    framing with CRC-8/CRC-16, chosen subframe shape per call."""
    assert sr == 8000 and bps == 16
    nch = len(channel_samples)
    n_total = len(channel_samples[0])
    subframe_kwargs = subframe_kwargs or {"kind": "verbatim"}
    out = bytearray(b"fLaC")
    si = _FlacBW()
    si.w(block_size, 16)
    si.w(block_size, 16)
    si.w(0, 24)
    si.w(0, 24)
    si.w(sr, 20)
    si.w(nch - 1, 3)
    si.w(bps - 1, 5)
    si.w(n_total, 36)
    sib = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + len(sib).to_bytes(3, "big") + sib
    for frame_no, start in enumerate(range(0, n_total, block_size)):
        blk = [c[start : start + block_size] for c in channel_samples]
        nsamp = len(blk[0])
        bw = _FlacBW()
        bw.w(0b11111111111110, 14)
        bw.w(0, 2)
        bs_code = _FLAC_BS_CODES.get(nsamp, 6)
        bw.w(bs_code, 4)
        bw.w(4, 4)   # 8 kHz
        mode_code = {"independent": nch - 1, "left_side": 8,
                     "right_side": 9, "mid_side": 10}[ch_mode]
        bw.w(mode_code, 4)
        bw.w(4, 3)   # 16-bit
        bw.w(0, 1)
        if frame_no < 0x80:
            bw.w(frame_no, 8)
        else:
            bw.w(0xC0 | (frame_no >> 6), 8)
            bw.w(0x80 | (frame_no & 0x3F), 8)
        if bs_code == 6:
            bw.w(nsamp - 1, 8)
        bw.align()
        hdr = bw.bytes()
        hdr += bytes([M._flac_crc8(hdr)])
        body = _FlacBW()
        if ch_mode == "independent":
            for c in range(nch):
                _flac_write_subframe(body, blk[c], bps, **subframe_kwargs)
        else:
            side = [l - r for l, r in zip(blk[0], blk[1])]
            if ch_mode == "left_side":
                _flac_write_subframe(body, blk[0], bps, **subframe_kwargs)
                _flac_write_subframe(body, side, bps + 1, **subframe_kwargs)
            elif ch_mode == "right_side":
                _flac_write_subframe(body, side, bps + 1, **subframe_kwargs)
                _flac_write_subframe(body, blk[1], bps, **subframe_kwargs)
            else:
                mid = [(l + r) >> 1 for l, r in zip(blk[0], blk[1])]
                _flac_write_subframe(body, mid, bps, **subframe_kwargs)
                _flac_write_subframe(body, side, bps + 1, **subframe_kwargs)
        body.align()
        frame = hdr + body.bytes()
        frame += M._flac_crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 500),
    kind=st.sampled_from(["verbatim", "constant"]),
    seed=st.integers(0, 2**32 - 1),
)
def test_flac_mono_roundtrip_random(n, kind, seed):
    rng = np.random.default_rng(seed)
    if kind == "constant":
        v = int(rng.integers(-32768, 32768))
        s = [v] * n
    else:
        s = [int(x) for x in rng.integers(-32768, 32768, n)]
    sr, got = M._decode_flac(_encode_flac_py([s]))
    assert sr == 8000 and got.tolist() == s


@settings(max_examples=20, deadline=None)
@given(
    order=st.integers(0, 4),
    porder=st.sampled_from([0, 1, 2]),
    param=st.integers(4, 10),
    escape=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_flac_fixed_predictors_roundtrip(order, porder, param, escape, seed):
    """FIXED orders 0-4 with Rice partitions (and raw-escape partitions):
    residual decode, warmup handling, and the per-order difference
    reconstruction are all lossless."""
    rng = np.random.default_rng(seed)
    base = [int(x) for x in np.cumsum(rng.integers(-50, 50, 192))]
    kwargs = {"kind": "fixed", "order": order, "porder": porder, "param": param}
    if escape:
        kwargs["escape_parts"] = {0}
    sr, got = M._decode_flac(_encode_flac_py([base], subframe_kwargs=kwargs))
    assert got.tolist() == base


@settings(max_examples=15, deadline=None)
@given(
    order=st.integers(1, 8),
    shift=st.integers(0, 14),
    seed=st.integers(0, 2**32 - 1),
)
def test_flac_lpc_roundtrip(order, shift, seed):
    rng = np.random.default_rng(seed)
    base = [int(x) for x in (3000 * np.sin(np.arange(192) * 0.07)).astype(int)]
    coefs = [int(x) for x in rng.integers(-(1 << 11), 1 << 11, order)]
    sr, got = M._decode_flac(_encode_flac_py(
        [base],
        subframe_kwargs={"kind": "lpc", "lpc_coefs": coefs, "lpc_shift": shift,
                         "lpc_prec": 13, "param": 12},
    ))
    assert got.tolist() == base


@settings(max_examples=15, deadline=None)
@given(
    mode=st.sampled_from(["independent", "left_side", "right_side", "mid_side"]),
    seed=st.integers(0, 2**32 - 1),
)
def test_flac_stereo_decorrelation_roundtrip(mode, seed):
    """All four channel assignments reconstruct L/R exactly; the downmix
    then matches the WAV/AIFF floor-mean contract."""
    rng = np.random.default_rng(seed)
    L = [int(x) for x in rng.integers(-20000, 20000, 192)]
    R = [int(x) for x in rng.integers(-20000, 20000, 192)]
    sr, got = M._decode_flac(_encode_flac_py([L, R], ch_mode=mode))
    assert got.tolist() == [(l + r) >> 1 for l, r in zip(L, R)]


def test_flac_wasted_bits_and_multiframe():
    rng = np.random.default_rng(9)
    s = [int(x) << 3 for x in rng.integers(-4096, 4096, 500)]
    sr, got = M._decode_flac(_encode_flac_py(
        [s], subframe_kwargs={"kind": "verbatim", "wasted": 3}))
    assert got.tolist() == s  # 2 full frames + 116-sample partial tail


def test_flac_crc_and_error_paths():
    import pytest

    with pytest.raises(ValueError):
        M._decode_flac(b"notflac")
    good = bytearray(_encode_flac_py([[7] * 192], subframe_kwargs={"kind": "constant"}))
    bad16 = bytearray(good)
    bad16[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-16"):
        M._decode_flac(bytes(bad16))
    bad8 = bytearray(good)
    bad8[4 + 4 + 34 + 5] ^= 0xFF  # frame-header CRC-8 byte
    with pytest.raises(ValueError, match="CRC-8"):
        M._decode_flac(bytes(bad8))
    with pytest.raises(ValueError):
        M._decode_flac(bytes(good[:-3]))


# ---- progressive JPEG (SOF2) ----------------------------------------------

#: flat prefix code over all 256 AC symbols (255 at 9 bits + 1 at 10):
#: progressive scans emit EOBn run-length symbols the standard table lacks
_FLAT_AC = (
    bytes([0] * 8 + [255, 1] + [0] * 6),
    bytes(list(range(255)) + [255]),
)


class _ProgWriter:
    """Scan-level state for the progressive encoder: bit writer + EOBRUN +
    correction bits buffered until the next Huffman code (jcphuff-style)."""

    def __init__(self, ac_codes):
        self.bw = _BitWriterPy()
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.pending = []  # correction bits awaiting the next emitted code

    def emit_pending(self):
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def emit_eobrun(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            ln, code = self.ac_codes[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
            self.emit_pending()


def _encode_jpeg_progressive_py(w, h, blocks, q, script):
    """Reference progressive writer (grayscale, one component) over chosen
    QUANTIZED coefficients: ``script`` is a list of (Ss, Se, Ah, Al) scans
    covering DC and AC bands with successive approximation, encoded per
    ITU T.81 G.1.2 (DC point transform = arithmetic shift; AC first pass
    with EOBRUN; AC refinement with buffered correction bits)."""
    zz = M._JPEG_ZIGZAG
    zblocks = [[int(c[zz[i]]) for i in range(64)] for c in blocks]
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0])
    out += bytes(int(q[zz[i]]) for i in range(64))
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    # progressive AC scans need EOBn symbols (0x10..0xE0) that Annex K's
    # sequential table lacks — embed a flat 256-symbol AC table instead
    for tc, (counts, symbols) in ((0, _STD_DC_L), (1, _FLAT_AC)):
        out += (
            b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(symbols))
            + bytes([tc << 4]) + counts + symbols
        )
    dc_codes = _huff_codes_py(*_STD_DC_L)
    ac_codes = _huff_codes_py(*_FLAT_AC)
    for ss, se, ah, al in script:
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, ss, se, (ah << 4) | al])
        pw = _ProgWriter(ac_codes)
        bw = pw.bw
        if ss == 0:
            pred = 0
            for zc in zblocks:
                v = zc[0] >> al  # DC point transform: arithmetic shift
                if ah == 0:
                    t, bits = _mag_bits_py(v - pred)
                    ln, code = dc_codes[t]
                    bw.write(code, ln)
                    bw.write(bits, t)
                    pred = v
                else:
                    bw.write(v & 1, 1)
        elif ah == 0:
            # AC first pass: sign-magnitude point transform, EOBRUN
            for zc in zblocks:
                vals = [
                    (x >> al) if x >= 0 else -((-x) >> al) for x in zc
                ]
                nz = [k for k in range(ss, se + 1) if vals[k]]
                if not nz:
                    pw.eobrun += 1
                    continue
                pw.emit_eobrun()
                run = 0
                for k in range(ss, nz[-1] + 1):
                    if vals[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_codes[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    t, bits = _mag_bits_py(vals[k])
                    ln, code = ac_codes[(run << 4) | t]
                    bw.write(code, ln)
                    bw.write(bits, t)
                    run = 0
                if nz[-1] < se:
                    pw.eobrun += 1
            pw.emit_eobrun()
        else:
            # AC refinement (jcphuff encode_mcu_AC_refine). TWO correction-
            # bit buffers, exactly like libjpeg: ``pw.pending`` (BE) holds
            # bits of EOB-run-covered blocks and flushes with the EOBn
            # code; ``br`` holds the CURRENT block's bits and flushes after
            # this block's own (run,1)/ZRL symbol. Conflating them
            # reorders bits whenever a block has history bits before a
            # newly-significant coefficient while an EOB run is pending.
            for zc in zblocks:
                absv = [abs(x) >> al for x in zc]
                eobpos = max([k for k in range(ss, se + 1) if absv[k] == 1], default=ss - 1)
                run = 0
                br: list[int] = []
                for k in range(ss, se + 1):
                    t = absv[k]
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and k <= eobpos:
                        pw.emit_eobrun()
                        ln, code = ac_codes[0xF0]
                        bw.write(code, ln)
                        run -= 16
                        for b in br:
                            bw.write(b, 1)
                        br = []
                    if t > 1:  # history-nonzero: buffer its correction bit
                        br.append(t & 1)
                        continue
                    pw.emit_eobrun()
                    ln, code = ac_codes[(run << 4) | 1]
                    bw.write(code, ln)
                    bw.write(0 if zc[k] < 0 else 1, 1)
                    for b in br:
                        bw.write(b, 1)
                    br = []
                    run = 0
                if run > 0 or br:
                    pw.eobrun += 1
                    pw.pending.extend(br)
            pw.emit_eobrun()
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


_PROG_SCRIPT = [
    (0, 0, 0, 1),    # DC first, one bit held back
    (1, 5, 0, 2),    # low AC band, two bits held back
    (6, 63, 0, 2),   # high AC band
    (0, 0, 1, 0),    # DC refinement
    (1, 5, 1, 1),    # AC refinements, bit by bit
    (6, 63, 1, 1),
    (1, 5, 1, 0),
    (6, 63, 1, 0),
]


@settings(max_examples=15, deadline=None)
@given(
    bw_=st.integers(1, 3),
    bh_=st.integers(1, 3),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_progressive_equals_sequential(bw_, bh_, seed):
    """Progressive decode (spectral selection + 2-level successive
    approximation, EOBRUN across blocks, AC refinement correction bits)
    must reproduce the SEQUENTIAL decode of the same quantized
    coefficients bit-for-bit — the coefficient store is the invariant."""
    rng = np.random.default_rng(seed)
    w, h = bw_ * 8, bh_ * 8
    blocks = [_rand_block(rng) for _ in range(bw_ * bh_)]
    q = rng.integers(1, 30, 64).astype(np.int64)
    seq = _encode_jpeg_py(w, h, [(1, 1, 1, 0)], {0: q}, {1: blocks})
    prog = _encode_jpeg_progressive_py(w, h, blocks, q, _PROG_SCRIPT)
    sw, sh, spx = M._decode_jpeg(seq)
    pw_, ph, ppx = M._decode_jpeg(prog)
    assert (sw, sh) == (pw_, ph) == (w, h)
    assert (spx == ppx).all()


def test_jpeg_progressive_sparse_blocks_exercise_eobrun():
    """Many all-zero-AC blocks around one dense block: EOBRUN spans whole
    block runs in both the first pass and the refinement pass."""
    rng = np.random.default_rng(7)
    blocks = [np.zeros(64, dtype=np.int64) for _ in range(9)]
    blocks[4] = _rand_block(rng)
    for b in blocks[:4]:
        b[0] = int(rng.integers(-100, 100))  # DC only
    q = rng.integers(1, 20, 64).astype(np.int64)
    seq = _encode_jpeg_py(24, 24, [(1, 1, 1, 0)], {0: q}, {1: blocks})
    prog = _encode_jpeg_progressive_py(24, 24, blocks, q, _PROG_SCRIPT)
    assert (M._decode_jpeg(seq)[2] == M._decode_jpeg(prog)[2]).all()


# ---- WebP lossless (VP8L) --------------------------------------------------

class _VP8LWriter:
    """LSB-first bit writer; prefix-code bits go MSB-of-code first."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, nbits):
        for i in range(nbits):
            self.acc |= ((value >> i) & 1) << self.n
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_code(self, code, length):
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def flush(self):
        if self.n:
            self.out.append(self.acc)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _vp8l_flat_code(bw, alphabet, length):
    """Emit a normal prefix code assigning every symbol `length` bits (so
    canonical code of symbol s == s); CLC = {0:len1, length:len1}."""
    order = M._VP8L_CLC_ORDER
    bw.write(0, 1)  # not simple
    need = max(order.index(length), order.index(0)) + 1
    bw.write(need - 4, 4)
    for i in range(need):
        bw.write(1 if order[i] in (0, length) else 0, 3)
    bw.write(0, 1)  # no max-symbol cap
    # canonical CLC: symbol 0 -> code 0, symbol `length` -> code 1
    for _ in range(alphabet):
        bw.write_code(1, 1)  # emit `length` for every symbol


def _vp8l_simple_code(bw, syms):
    """Emit a simple code (1 or 2 symbols). Canonical: the SMALLER symbol
    value gets code 0. Returns {symbol: (code, nbits)} for emission."""
    bw.write(1, 1)
    bw.write(len(syms) - 1, 1)
    bw.write(1, 1)          # first symbol in 8 bits
    bw.write(syms[0], 8)
    if len(syms) == 2:
        bw.write(syms[1], 8)
        lo, hi = min(syms), max(syms)
        return {lo: (0, 1), hi: (1, 1)}
    return {syms[0]: (0, 0)}  # single symbol: zero bits


def _vp8l_lz77_code(v):
    """(prefix_code, extra_value, extra_bits) for a length/distance value."""
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 40):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= v <= offset + (1 << extra):
            return code, v - offset - 1, extra
    raise ValueError(v)


def _vp8l_wrap(payload):
    import struct
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l


def _vp8l_header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _vp8l_emit_tokens(bw, tokens, cache_bits=0, level0=True):
    """Flat-code entropy image body: optional cache header, no meta codes
    (level-0 images carry the absent-meta bit), 5 flat prefix codes, then
    the token stream. Tokens:
    ('lit', a, r, g, b) / ('copy', length, dist_value) / ('cache', idx)."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)  # no meta prefix codes
    galpha = 256 + 24 + cache_size
    glen = 9 if galpha <= 512 else 10
    _vp8l_flat_code(bw, galpha, glen)
    for _ in range(3):
        _vp8l_flat_code(bw, 256, 8)
    _vp8l_flat_code(bw, 40, 6)
    for tok in tokens:
        if tok[0] == "lit":
            _, a, r, g, b = tok
            bw.write_code(g, glen)
            bw.write_code(r, 8)
            bw.write_code(b, 8)
            bw.write_code(a, 8)
        elif tok[0] == "copy":
            _, length, dist_value = tok
            c, ev, eb = _vp8l_lz77_code(length)
            bw.write_code(256 + c, glen)
            bw.write(ev, eb)
            c, ev, eb = _vp8l_lz77_code(dist_value)
            bw.write_code(c, 6)
            bw.write(ev, eb)
        else:
            bw.write_code(280 + tok[1], glen)


def _vp8l_cache_index(px, cache_bits):
    return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)


def _lits(img):
    """Token stream of plain literals from an (h, w, 4) arr of (a,r,g,b)."""
    h, w, _ = img.shape
    return [
        ("lit", int(img[y, x, 0]), int(img[y, x, 1]), int(img[y, x, 2]), int(img[y, x, 3]))
        for y in range(h)
        for x in range(w)
    ]


def _rand_argb(rng, h, w):
    return rng.integers(0, 256, (h, w, 4)).astype(np.int64)


def _expect_rgb(img):
    return np.stack([img[:, :, 1], img[:, :, 2], img[:, :, 3]], axis=2).astype(np.uint8)


def test_vp8l_literals_flat_code():
    rng = np.random.default_rng(0)
    img = _rand_argb(rng, 5, 7)
    bw = _VP8LWriter()
    _vp8l_header(bw, 7, 5)
    bw.write(0, 1)  # no transforms
    _vp8l_emit_tokens(bw, _lits(img))
    w, h, px = M._decode_webp(_vp8l_wrap(bw.flush()))
    assert (w, h) == (7, 5)
    assert (px == _expect_rgb(img)).all()


def test_vp8l_simple_codes_two_color():
    """All five prefix codes in 'simple' mode; single-symbol codes consume
    zero bits."""
    bw = _VP8LWriter()
    _vp8l_header(bw, 4, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta prefix codes
    gcodes = _vp8l_simple_code(bw, [10, 200])   # greens: 10 or 200
    rcodes = _vp8l_simple_code(bw, [7])         # red always 7 (0 bits)
    bcodes = _vp8l_simple_code(bw, [3, 250])
    acodes = _vp8l_simple_code(bw, [255])
    _vp8l_simple_code(bw, [1])                  # distance code, unused
    pattern = [(10, 3), (200, 250), (10, 250), (200, 3)] * 3
    for g, b in pattern:
        bw.write_code(*gcodes[g])
        # order: green, red, blue, alpha
        bw.write_code(*rcodes[7])
        bw.write_code(*bcodes[b])
        bw.write_code(*acodes[255])
    w, h, px = M._decode_webp(_vp8l_wrap(bw.flush()))
    assert (w, h) == (4, 3)
    flat = px.reshape(-1, 3)
    for i, (g, b) in enumerate(pattern):
        assert tuple(flat[i]) == (7, g, b), (i, tuple(flat[i]))


def test_vp8l_lz77_vertical_copy_and_cache():
    """One literal row, then a single back-reference replicating it down
    (distance == width via the dist+120 escape), plus a color-cache run."""
    rng = np.random.default_rng(3)
    w_, h_ = 6, 5
    row = _rand_argb(rng, 1, w_)
    img = np.tile(row, (h_, 1, 1))
    tokens = _lits(row) + [("copy", (h_ - 1) * w_, w_ + 120)]
    bw = _VP8LWriter()
    _vp8l_header(bw, w_, h_)
    bw.write(0, 1)
    _vp8l_emit_tokens(bw, tokens)
    w, h, px = M._decode_webp(_vp8l_wrap(bw.flush()))
    assert (w, h) == (w_, h_) and (px == _expect_rgb(img)).all()

    # color cache: two literals then cache hits for both
    cb = 4
    p0 = (255, 1, 2, 3)
    p1 = (255, 9, 8, 7)
    px0 = (p0[0] << 24) | (p0[1] << 16) | (p0[2] << 8) | p0[3]
    px1 = (p1[0] << 24) | (p1[1] << 16) | (p1[2] << 8) | p1[3]
    toks = [
        ("lit",) + p0, ("lit",) + p1,
        ("cache", _vp8l_cache_index(px0, cb)),
        ("cache", _vp8l_cache_index(px1, cb)),
    ]
    bw = _VP8LWriter()
    _vp8l_header(bw, 2, 2)
    bw.write(0, 1)
    _vp8l_emit_tokens(bw, toks, cache_bits=cb)
    w, h, px = M._decode_webp(_vp8l_wrap(bw.flush()))
    assert (w, h) == (2, 2)
    assert tuple(px[0, 0]) == p0[1:] and tuple(px[0, 1]) == p1[1:]
    assert tuple(px[1, 0]) == p0[1:] and tuple(px[1, 1]) == p1[1:]


def test_vp8l_subtract_green_transform():
    rng = np.random.default_rng(5)
    img = _rand_argb(rng, 4, 4)
    res = img.copy()
    res[:, :, 1] = (img[:, :, 1] - img[:, :, 2]) % 256  # r -= g
    res[:, :, 3] = (img[:, :, 3] - img[:, :, 2]) % 256  # b -= g
    bw = _VP8LWriter()
    _vp8l_header(bw, 4, 4)
    bw.write(1, 1)
    bw.write(2, 2)  # subtract-green
    bw.write(0, 1)  # end transforms
    _vp8l_emit_tokens(bw, _lits(res))
    w, h, px = M._decode_webp(_vp8l_wrap(bw.flush()))
    assert (px == _expect_rgb(img)).all()


def test_vp8l_distance_map_prefix_pinned():
    """The generated 120-entry neighborhood must reproduce the spec's
    literal table (leading entries pinned; short plane-code copy decodes
    end-to-end below)."""
    expect = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    ]
    assert M._VP8L_DIST_MAP[:24] == expect
    assert len(M._VP8L_DIST_MAP) == 120
    assert len(set(M._VP8L_DIST_MAP)) == 120


def test_vp8l_plane_code_copy_runs():
    """Short distances through the 2D map: code 2 -> (1,0) -> dist 1
    (pixel run), code 1 -> (0,1) -> dist == width (row copy, equal to the
    dist+120 escape)."""
    w_, h_ = 5, 4
    p = ("lit", 255, 40, 50, 60)
    tokens = [p, ("copy", w_ * h_ - 1, 2)]  # plane code 2 = (1, 0)
    bw = _VP8LWriter()
    _vp8l_header(bw, w_, h_)
    bw.write(0, 1)
    _vp8l_emit_tokens(bw, tokens)
    w, h, px = M._decode_webp(_vp8l_wrap(bw.flush()))
    assert (px == np.array([40, 50, 60], np.uint8)).all()

    rng = np.random.default_rng(11)
    row = _rand_argb(rng, 1, w_)
    img = np.tile(row, (h_, 1, 1))
    for dist_value in (1, w_ + 120):  # plane code 1 == (0,1) == width
        tokens = _lits(row) + [("copy", (h_ - 1) * w_, dist_value)]
        bw = _VP8LWriter()
        _vp8l_header(bw, w_, h_)
        bw.write(0, 1)
        _vp8l_emit_tokens(bw, tokens)
        w, h, px = M._decode_webp(_vp8l_wrap(bw.flush()))
        assert (px == _expect_rgb(img)).all(), dist_value


# test-side forward predictor (independent reimplementation of the spec)
def _tst_avg2(p, q):
    return tuple((a + b) >> 1 for a, b in zip(p, q))


def _tst_clamp(v):
    return 0 if v < 0 else 255 if v > 255 else v


def _tst_predict(mode, L, T, TL, TR):
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _tst_avg2(_tst_avg2(L, TR), T)
    if mode == 6:
        return _tst_avg2(L, TL)
    if mode == 7:
        return _tst_avg2(L, T)
    if mode == 8:
        return _tst_avg2(TL, T)
    if mode == 9:
        return _tst_avg2(T, TR)
    if mode == 10:
        return _tst_avg2(_tst_avg2(L, TL), _tst_avg2(T, TR))
    if mode == 11:
        p = [L[i] + T[i] - TL[i] for i in range(4)]
        pl = sum(abs(p[i] - L[i]) for i in range(4))
        pt = sum(abs(p[i] - T[i]) for i in range(4))
        return L if pl < pt else T
    if mode == 12:
        return tuple(_tst_clamp(L[i] + T[i] - TL[i]) for i in range(4))
    if mode == 13:
        av = _tst_avg2(L, T)
        out = []
        for i in range(4):
            d = av[i] - TL[i]
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(_tst_clamp(av[i] + half))
        return tuple(out)
    raise ValueError(mode)


def _tst_predict_residuals(img, mode):
    """Forward predictor transform over an (h, w, 4) image, single block."""
    h, w, _ = img.shape
    res = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            px = tuple(int(v) for v in img[y, x])
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = tuple(int(v) for v in img[y, x - 1])
            elif x == 0:
                pred = tuple(int(v) for v in img[y - 1, x])
            else:
                L = tuple(int(v) for v in img[y, x - 1])
                T = tuple(int(v) for v in img[y - 1, x])
                TL = tuple(int(v) for v in img[y - 1, x - 1])
                TR = (
                    tuple(int(v) for v in img[y - 1, x + 1])
                    if x + 1 < w
                    else tuple(int(v) for v in img[y, 0])
                )
                pred = _tst_predict(mode, L, T, TL, TR)
            res[y, x] = [(px[i] - pred[i]) % 256 for i in range(4)]
    return res


def _vp8l_subimage(bw, tokens):
    _vp8l_emit_tokens(bw, tokens, level0=False)


def test_vp8l_predictor_all_modes():
    """All 14 predictor modes, one whole-image block each: residuals from
    an independent forward transform must invert to the exact pixels."""
    rng = np.random.default_rng(21)
    for mode in range(14):
        img = _rand_argb(rng, 6, 6)
        res = _tst_predict_residuals(img, mode)
        bw = _VP8LWriter()
        _vp8l_header(bw, 6, 6)
        bw.write(1, 1)
        bw.write(0, 2)          # predictor transform
        bw.write(3 - 2, 3)      # size_bits=3: one 8x8 block covers 6x6
        _vp8l_subimage(bw, [("lit", 0, 0, mode, 0)])
        bw.write(0, 1)          # end transforms
        _vp8l_emit_tokens(bw, _lits(res))
        w, h, px = M._decode_webp(_vp8l_wrap(bw.flush()))
        assert (px == _expect_rgb(img)).all(), mode


def test_vp8l_predictor_multi_block():
    """2x1 predictor blocks with different modes — per-block mode lookup."""
    rng = np.random.default_rng(22)
    img = _rand_argb(rng, 4, 8)
    # blocks of 4x4 (size_bits=2): modes 1 (left) and 2 (top)
    h, w = 4, 8
    res = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            px = tuple(int(v) for v in img[y, x])
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = tuple(int(v) for v in img[y, x - 1])
            elif x == 0:
                pred = tuple(int(v) for v in img[y - 1, x])
            else:
                mode = 1 if (x >> 2) == 0 else 2
                L = tuple(int(v) for v in img[y, x - 1])
                T = tuple(int(v) for v in img[y - 1, x])
                pred = L if mode == 1 else T
            res[y, x] = [(px[i] - pred[i]) % 256 for i in range(4)]
    bw = _VP8LWriter()
    _vp8l_header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)
    bw.write(2 - 2, 3)  # size_bits=2 -> 2x1 blocks
    _vp8l_subimage(bw, [("lit", 0, 0, 1, 0), ("lit", 0, 0, 2, 0)])
    bw.write(0, 1)
    _vp8l_emit_tokens(bw, _lits(res))
    _, _, px = M._decode_webp(_vp8l_wrap(bw.flush()))
    assert (px == _expect_rgb(img)).all()


def test_vp8l_cross_color_transform():
    rng = np.random.default_rng(23)
    img = _rand_argb(rng, 4, 4)
    g2r, g2b, r2b = 37, -90, 115  # signed int8 transform elements

    def s8(v):
        return ((v & 0xFF) ^ 0x80) - 0x80

    def delta(t, c):
        return (t * s8(c)) >> 5

    res = img.copy()
    for y in range(4):
        for x in range(4):
            a, r, g, b = (int(v) for v in img[y, x])
            r_res = (r - delta(g2r, g)) % 256
            b_res = (b - delta(g2b, g) - delta(r2b, r)) % 256
            res[y, x] = [a, r_res, g, b_res]
    bw = _VP8LWriter()
    _vp8l_header(bw, 4, 4)
    bw.write(1, 1)
    bw.write(1, 2)          # cross-color
    bw.write(3 - 2, 3)      # one block
    # cte pixel: blue=green_to_red, green=green_to_blue, red=red_to_blue
    _vp8l_subimage(bw, [("lit", 0, r2b & 0xFF, g2b & 0xFF, g2r & 0xFF)])
    bw.write(0, 1)
    _vp8l_emit_tokens(bw, _lits(res))
    _, _, px = M._decode_webp(_vp8l_wrap(bw.flush()))
    assert (px == _expect_rgb(img)).all()


def test_vp8l_color_indexing_packed():
    """3-color palette (xbits=2: four 2-bit indices per green byte) with
    delta-coded palette entries."""
    palette = [(255, 10, 20, 30), (255, 200, 100, 50), (255, 0, 255, 128)]
    w_, h_ = 10, 3
    rng = np.random.default_rng(24)
    idx = rng.integers(0, 3, (h_, w_))
    img = np.array([[palette[i] for i in row] for row in idx], np.int64)
    # palette deltas per channel
    deltas = []
    prev = (0, 0, 0, 0)
    for c in palette:
        deltas.append(tuple((c[i] - prev[i]) % 256 for i in range(4)))
        prev = c
    # packed image: width ceil(10/4)=3, each green byte 4 indices LSB-first
    packed_w = -(-w_ // 4)
    packed = np.zeros((h_, packed_w), np.int64)
    for y in range(h_):
        for x in range(w_):
            packed[y, x >> 2] |= int(idx[y, x]) << ((x & 3) * 2)
    bw = _VP8LWriter()
    _vp8l_header(bw, w_, h_)
    bw.write(1, 1)
    bw.write(3, 2)              # color indexing
    bw.write(len(palette) - 1, 8)
    _vp8l_subimage(bw, [("lit",) + d for d in deltas])
    bw.write(0, 1)
    _vp8l_emit_tokens(
        bw,
        [("lit", 0, 0, int(packed[y, x]), 0) for y in range(h_) for x in range(packed_w)],
    )
    w, h, px = M._decode_webp(_vp8l_wrap(bw.flush()))
    assert (w, h) == (w_, h_)
    assert (px == _expect_rgb(img)).all()


def test_vp8l_meta_prefix_groups():
    """Two meta prefix-code groups selected by 4x4 block: group 0 flat,
    group 1 simple two-symbol — group switching is per pixel."""
    w_, h_ = 8, 4
    rng = np.random.default_rng(25)
    left = _rand_argb(rng, h_, 4)           # block 0: arbitrary pixels
    right_g = [(77, 3), (210, 3)]           # block 1: two (green, blue) combos
    bw = _VP8LWriter()
    _vp8l_header(bw, w_, h_)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix codes present
    bw.write(2 - 2, 3)  # mbits=2 -> 4x4 blocks -> meta image 2x1
    # meta image pixels: (red<<8|green) = group index
    _vp8l_subimage(bw, [("lit", 0, 0, 0, 0), ("lit", 0, 0, 1, 0)])
    # group 0: flat codes
    _vp8l_flat_code(bw, 280, 9)
    for _ in range(3):
        _vp8l_flat_code(bw, 256, 8)
    _vp8l_flat_code(bw, 40, 6)
    # group 1: simple codes
    g1_g = _vp8l_simple_code(bw, [77, 210])
    g1_r = _vp8l_simple_code(bw, [5])
    g1_b = _vp8l_simple_code(bw, [3])
    g1_a = _vp8l_simple_code(bw, [255])
    _vp8l_simple_code(bw, [1])
    expected = np.zeros((h_, w_, 4), np.int64)
    k = 0
    for y in range(h_):
        for x in range(w_):
            if (x >> 2) == 0:
                a, r, g, b = (int(v) for v in left[y, x])
                bw.write_code(g, 9)
                bw.write_code(r, 8)
                bw.write_code(b, 8)
                bw.write_code(a, 8)
                expected[y, x] = (a, r, g, b)
            else:
                g, _b = right_g[k % 2]
                k += 1
                bw.write_code(*g1_g[g])
                bw.write_code(*g1_r[5])
                bw.write_code(*g1_b[3])
                bw.write_code(*g1_a[255])
                expected[y, x] = (255, 5, g, 3)
    w, h, px = M._decode_webp(_vp8l_wrap(bw.flush()))
    assert (px == _expect_rgb(expected)).all()


def test_vp8l_error_paths():
    import pytest

    with pytest.raises(ValueError, match="RIFF"):
        M._decode_webp(b"nope")
    # lossy VP8 chunk -> codec gate message
    import struct
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="lossless"):
        M._decode_webp(lossy)
    # bad signature byte
    bw = _VP8LWriter()
    bw.write(0x2E, 8)
    with pytest.raises(ValueError, match="signature"):
        M._decode_webp(_vp8l_wrap(bw.flush() + b"\x00" * 8))
    # truncated stream
    bw = _VP8LWriter()
    _vp8l_header(bw, 16, 16)
    bw.write(0, 1)
    with pytest.raises(ValueError):
        M._decode_webp(_vp8l_wrap(bw.flush()))


# ---- AVI container (MJPEG / DIB video) --------------------------------------


def _avi_py(chunks, w, h, usec=100_000, rec=False, idx1=False, avih=True):
    """Minimal-but-valid AVI builder for parser tests: RIFF tree with an
    avih MainAVIHeader, no strl (the parser doesn't need one), and the
    given movi chunks as (fourcc, payload) pairs — optionally wrapped in a
    'rec ' grouping list and followed by an idx1 index chunk."""

    def ck(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    frames = b"".join(ck(tag, body) for tag, body in chunks)
    if rec:
        frames = ck(b"LIST", b"rec " + frames)
    movi = ck(b"LIST", b"movi" + frames)
    parts = b""
    if avih:
        hdr = struct.pack("<IIIIIIIIII", usec, 0, 0, 0x10, len(chunks), 0, 1, 0, w, h)
        hdr += b"\x00" * 16
        parts += ck(b"LIST", b"hdrl" + ck(b"avih", hdr))
    parts += movi
    if idx1:
        parts += ck(b"idx1", struct.pack("<4sIII", b"00dc", 0x10, 4, 8))
    return b"RIFF" + struct.pack("<I", 4 + len(parts)) + b"AVI " + parts


@settings(max_examples=10, deadline=None)
@given(bw_=st.integers(1, 2), n=st.integers(1, 4), seed=st.integers(0, 2**32 - 1))
def test_avi_mjpeg_frames_match_standalone_jpegs(bw_, n, seed):
    """Every '00dc' frame decodes bit-identically to the same bytes decoded
    as a standalone JPEG, frame order and count preserved, and the avih
    timing round-trips. Odd-length JPEG payloads exercise the RIFF
    even-byte chunk padding."""
    rng = np.random.default_rng(seed)
    w, h = bw_ * 8, 8
    jpegs = []
    for _ in range(n):
        blocks = [_rand_block(rng) for _ in range(bw_)]
        q = rng.integers(1, 30, 64).astype(np.int64)
        jpegs.append(_encode_jpeg_py(w, h, [(1, 1, 1, 0)], {0: q}, {1: blocks}))
    buf = _avi_py([(b"00dc", j) for j in jpegs], w, h, usec=40_000)
    aw, ah, usec, frames = M._avi_frames(buf)
    assert (aw, ah, usec, len(frames)) == (w, h, 40_000, n)
    for j, px in zip(jpegs, frames):
        _, _, want = M._decode_jpeg(j)
        assert (px == want).all()


def test_avi_dib_frames_and_rec_grouping():
    """'00db' frames are bottom-up BGR with 4-byte row stride; frames inside
    a 'rec ' grouping list are found; a trailing idx1 chunk is ignored."""
    rng = np.random.default_rng(7)
    w, h = 3, 2  # stride 12 -> 3 pad bytes per row
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].tobytes()  # BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    dib = b"".join(rows)
    buf = _avi_py([(b"00db", dib), (b"00db", dib)], w, h, rec=True, idx1=True)
    aw, ah, _, frames = M._avi_frames(buf)
    assert (aw, ah, len(frames)) == (w, h, 2)
    assert (frames[0] == img).all() and (frames[1] == img).all()
    # single-image contract: first frame
    dw, dh, px = M._decode_avi(buf)
    assert (dw, dh) == (w, h) and (px == img).all()


def test_avi_error_paths():
    import pytest

    with pytest.raises(ValueError, match="RIFF"):
        M._avi_frames(b"nope")
    # no frames at all
    with pytest.raises(ValueError, match="without video frames"):
        M._avi_frames(_avi_py([], 8, 8))
    # declared dims disagree with decoded frame
    rng = np.random.default_rng(0)
    j = _encode_jpeg_py(8, 8, [(1, 1, 1, 0)], {0: np.ones(64, np.int64)},
                        {1: [_rand_block(rng)]})
    with pytest.raises(ValueError, match="header dims"):
        M._avi_frames(_avi_py([(b"00dc", j)], 16, 8))
    # DIB before any avih header: dims unknown
    with pytest.raises(ValueError, match="avih"):
        M._avi_frames(_avi_py([(b"00db", b"\x00" * 12)], 2, 1, avih=False))
    # chunk size overruns its parent
    bad = bytearray(_avi_py([(b"00dc", j)], 8, 8))
    pos = bytes(bad).find(b"00dc") + 4  # the frame chunk's size field
    bad[pos + 3] = 0x7F  # inflate it far past the movi list's end
    with pytest.raises(ValueError, match="overruns"):
        M._avi_frames(bytes(bad))
    # DIB shorter than stride*height
    with pytest.raises(ValueError, match="stride"):
        M._avi_frames(_avi_py([(b"00db", b"\x00" * 4)], 2, 1))


def test_avi_through_spark_pipeline(spark):
    """decode_media and video_frame_features end-to-end over Spark: real
    multi-frame decode (n_frames, all-frames luma) and tick-accurate frame
    sampling; the non-AVI honesty gate raises."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    w = h = 8
    jpegs = []
    for k in range(3):
        blocks = [_rand_block(rng)]
        q = rng.integers(1, 30, 64).astype(np.int64)
        jpegs.append(_encode_jpeg_py(w, h, [(1, 1, 1, 0)], {0: q}, {1: blocks}))
    buf = _avi_py([(b"00dc", j) for j in jpegs], w, h, usec=100_000)
    df = spark.createDataFrame([(1, bytearray(buf))], "id long, raw binary")
    media = M.attach_media(df, "raw", "video", "avi")
    row = M.decode_media(media).collect()[0]
    lumas = [M._mean_luma(M._decode_jpeg(j)[2]) for j in jpegs]
    assert (row.width, row.height, row.n_frames) == (w, h, 3)
    assert abs(row.mean_luma - sum(lumas) / 3) < 1e-12
    sampled = M.video_frame_features(media, every_ms=150).orderBy("frame_idx").collect()
    # 300 ms of video sampled at 0/150 ms -> frames 0 and 1
    assert [(r.frame_idx, r.ts_ms) for r in sampled] == [(0, 0), (1, 150)]
    assert abs(sampled[0].luma - lumas[0]) < 1e-12
    assert abs(sampled[1].luma - lumas[1]) < 1e-12
    import pytest

    gif = M.attach_media(df, "raw", "video", "gif")
    with pytest.raises(NotImplementedError, match="AVI"):
        M.video_frame_features(gif, every_ms=100).collect()


# ---- TGA (type 2 + type 10 RLE) ---------------------------------------------


def _tga_bytes(arr, rle=False, top_down=False, bpp=24):
    """Reference TGA writer for tests: arr is HxWx3 uint8 RGB."""
    import struct

    import numpy as np

    h, w, _ = arr.shape
    desc = 0x20 if top_down else 0
    hdr = bytes([0, 0, 10 if rle else 2]) + b"\x00" * 5 + struct.pack(
        "<HHHH", 0, 0, w, h
    ) + bytes([bpp, desc])
    rows = arr if top_down else arr[::-1]
    nch = bpp // 8
    px = []
    for r in rows:
        for p in r:
            bgr = bytes([int(p[2]), int(p[1]), int(p[0])])
            px.append(bgr + (b"\xff" if nch == 4 else b""))
    if not rle:
        return hdr + b"".join(px)
    # simple RLE: greedy runs within the flat pixel stream
    out = bytearray()
    i = 0
    flat = px
    while i < len(flat):
        j = i
        while j + 1 < len(flat) and flat[j + 1] == flat[i] and j - i < 127:
            j += 1
        if j > i:  # run
            out.append(0x80 | (j - i))
            out += flat[i]
            i = j + 1
        else:  # literal stretch
            k = i
            while (
                k + 1 < len(flat) and flat[k + 1] != flat[k] and k - i < 127
            ):
                k += 1
            out.append(k - i)
            out += b"".join(flat[i : k + 1])
            i = k + 1
    return hdr + bytes(out)


@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
    rle=st.booleans(),
    top_down=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_tga_roundtrip_property(w, h, seed, rle, top_down):
    import numpy as np

    from arrow_parquet_logs_spark.operators.multimodal import _decode_tga

    rng = np.random.RandomState(seed)
    # low-cardinality palette provokes RLE runs
    arr = rng.randint(0, 4, size=(h, w, 3)).astype(np.uint8) * 80
    got_w, got_h, got = _decode_tga(_tga_bytes(arr, rle=rle, top_down=top_down))
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(got, arr)


def test_tga_32bpp_and_rejects():
    import numpy as np
    import pytest

    from arrow_parquet_logs_spark.operators.multimodal import _decode_tga

    arr = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    buf = _tga_bytes(arr, rle=False, bpp=32)
    w, h, got = _decode_tga(buf)
    assert (w, h) == (2, 2) and np.array_equal(got, arr)  # alpha dropped
    with pytest.raises(ValueError, match="unsupported TGA"):
        _decode_tga(bytes([0, 1, 1]) + b"\x00" * 15)  # colormapped
    with pytest.raises(ValueError, match="short header"):
        _decode_tga(b"\x00\x00")


# ---- MP4 / ISO-BMFF container index ----------------------------------------

def _mp4_bytes(doc: int = 5) -> bytes:
    from arrow_parquet_logs_spark.queries.multimodalq import _mp4_parts

    p = _mp4_parts()
    return p[0] + bytes([doc]) + p[1] + bytes([doc + 1]) + p[2] + bytes([doc + 2]) + p[3]


def test_mp4_index_baseline():
    from arrow_parquet_logs_spark.operators.multimodal import _mp4_index

    (tr,) = _mp4_index(_mp4_bytes(7))
    assert tr == {
        "track_id": 1, "handler": "vide", "codec": "mp4v", "n_samples": 3,
        "duration_ms": 300, "width": 8, "height": 8, "sample_bytes": 12,
        "sample_byte_sum": 7 + 8 + 9, "brand": "isom",
    }


def test_mp4_index_co64_largesize_stz2_multichunk():
    """Hand-built variant exercising the 64-bit paths and non-uniform
    tables the fixture query doesn't: co64 chunk offsets, a largesize
    (size==1) mdat, an stz2 8-bit size table, and a 2-run stsc mapping
    (chunk 1 holds two samples, chunk 2 one)."""
    import struct

    from arrow_parquet_logs_spark.operators.multimodal import _mp4_index

    def box(tag, body):
        return struct.pack(">I", 8 + len(body)) + tag + body

    def full(tag, body, version=0, flags=0):
        return box(tag, bytes([version]) + flags.to_bytes(3, "big") + body)

    def large_box(tag, body):  # size==1 -> 64-bit largesize after the type
        return struct.pack(">I", 1) + tag + struct.pack(">Q", 16 + len(body)) + body

    samples = [b"\x0a\x00", b"\x14\x00\x00", b"\x1e"]  # sizes 2, 3, 1
    matrix = struct.pack(">9I", 1 << 16, 0, 0, 0, 1 << 16, 0, 0, 0, 1 << 30)

    def moov(off1, off2):
        vse = box(b"avc1", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                  + struct.pack(">HH", 16, 16) + struct.pack(">II", 1 << 16, 1 << 16)
                  + b"\x00" * 4 + struct.pack(">H", 1) + b"\x00" * 32
                  + struct.pack(">Hh", 24, -1))
        stbl = box(
            b"stbl",
            full(b"stsd", struct.pack(">I", 1) + vse)
            + full(b"stts", struct.pack(">III", 1, 3, 200))
            # runs: chunk 1 -> 2 samples, chunks >= 2 -> 1 sample
            + full(b"stsc", struct.pack(">I", 2)
                   + struct.pack(">III", 1, 2, 1) + struct.pack(">III", 2, 1, 1))
            + full(b"stz2", struct.pack(">I", 8)[:3] + bytes([8])
                   + struct.pack(">I", 3) + bytes([2, 3, 1]))
            + full(b"co64", struct.pack(">I", 2) + struct.pack(">QQ", off1, off2)),
        )
        mdia = box(
            b"mdia",
            full(b"mdhd", struct.pack(">IIIIHH", 0, 0, 600, 600, 0, 0))
            + full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00")
            + box(b"minf", stbl),
        )
        tkhd = full(b"tkhd", struct.pack(">IIIII", 0, 0, 9, 0, 600) + b"\x00" * 8
                    + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
                    + struct.pack(">II", 16 << 16, 16 << 16), flags=7)
        mvhd = full(b"mvhd", struct.pack(">IIIII", 0, 0, 600, 600, 1 << 16)
                    + struct.pack(">H", 0x0100) + b"\x00" * 10 + matrix
                    + b"\x00" * 24 + struct.pack(">I", 10))
        return box(b"moov", mvhd + box(b"trak", tkhd + mdia))

    ftyp = box(b"ftyp", b"mp42" + b"\x00" * 4 + b"mp42")
    probe = moov(0, 0)
    # mdat payload starts after the 16-byte largesize header; chunk 2
    # starts after chunk 1's two samples (2 + 3 bytes)
    base = len(ftyp) + len(probe) + 16
    m = moov(base, base + 5)
    assert len(m) == len(probe)
    buf = ftyp + m + large_box(b"mdat", b"".join(samples))

    (tr,) = _mp4_index(buf)
    assert tr["brand"] == "mp42" and tr["codec"] == "avc1" and tr["track_id"] == 9
    assert tr["n_samples"] == 3 and tr["sample_bytes"] == 6
    assert tr["duration_ms"] == 1000  # 600 ticks at timescale 600
    assert tr["width"] == tr["height"] == 16
    assert tr["sample_byte_sum"] == 0x0A + 0x14 + 0x1E


def test_mp4_index_error_paths():
    import pytest as _pytest
    import struct

    from arrow_parquet_logs_spark.operators.multimodal import _mp4_index

    with _pytest.raises(ValueError, match="ftyp"):
        _mp4_index(b"\x00\x00\x00\x08free")
    with _pytest.raises(ValueError, match="moov"):
        _mp4_index(b"\x00\x00\x00\x14ftypisom\x00\x00\x00\x00isom")
    good = _mp4_bytes(3)
    # truncation makes the mdat box overrun the file
    with _pytest.raises(ValueError, match="overruns"):
        _mp4_index(good[:-2])
    # an stco offset past EOF must be caught by the sample bounds check
    past = bytearray(good)
    struct.pack_into(">I", past, good.index(b"stco") + 4 + 4 + 4, len(good))
    with _pytest.raises(ValueError, match="past end"):
        _mp4_index(bytes(past))
    # a box whose declared size overruns its parent
    bad = bytearray(good)
    off = good.index(b"moov") - 4
    struct.pack_into(">I", bad, off, len(good) + 50)
    with _pytest.raises(ValueError, match="overruns"):
        _mp4_index(bytes(bad))


def test_mp4_index_through_spark_pipeline(spark):
    """The mapInPandas op end-to-end: ids and per-track rows survive the
    Arrow round-trip; two docs -> two rows with doc-dependent sums."""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, mp4_track_index

    df = spark.createDataFrame(
        [(1, _mp4_bytes(1)), (2, _mp4_bytes(2))], "id long, raw binary"
    )
    media = attach_media(df, "raw", "video", "mp4")
    rows = {r.id: r for r in mp4_track_index(media).collect()}
    assert rows[1].sample_byte_sum == 6 and rows[2].sample_byte_sum == 9
    assert rows[1].codec == "mp4v" and rows[1].duration_ms == 300


# ---- MP3 / MPEG-audio frame index ------------------------------------------

def _mp3_frame(byte1=0xFB, byte2=0x54, byte3=0xC0, fill=188):
    return bytes([0xFF, byte1, byte2, byte3]) + b"\x00" * fill


def test_mp3_index_padding_vbr_and_layers():
    from arrow_parquet_logs_spark.operators.multimodal import _mp3_frame_index

    # padding bit: 64kbps/48kHz MPEG1 L3 -> 192, padded -> 193
    padded = bytes([0xFF, 0xFB, 0x56, 0xC0]) + b"\x00" * 189
    idx = _mp3_frame_index(_mp3_frame() + padded)
    assert idx["n_frames"] == 2 and idx["duration_ms"] == 48
    # VBR: a 128kbps frame (idx 9 -> 0x94) is 384 bytes at 48kHz
    f128 = bytes([0xFF, 0xFB, 0x94, 0xC0]) + b"\x00" * 380
    idx = _mp3_frame_index(_mp3_frame() + f128)
    assert idx["vbr"] is True and idx["bitrate_kbps"] == 128
    # MPEG2 layer III: 72-factor lengths, 576 samples/frame.
    # version bits 10 -> byte1 0xF3; 64kbps is MPEG2-L3 index 8 -> 0x80|rate
    # 24kHz idx 1 -> byte2 0x84; len = 72*64000/24000 = 192
    m2 = bytes([0xFF, 0xF3, 0x84, 0xC0]) + b"\x00" * 188
    idx = _mp3_frame_index(m2 * 3)
    assert idx == {
        "version": "MPEG2", "layer": 3, "n_frames": 3, "sample_rate": 24000,
        "duration_ms": 576 * 3 * 1000 // 24000, "bitrate_kbps": 64,
        "vbr": False, "channel_mode": "mono", "id3v2_bytes": 0, "id3v1_bytes": 0,
    }
    # layer I: ((12*br/sr)+pad)*4; 256kbps@44.1k idx... use 448kbps/44100
    # L1 MPEG1 byte1 0xFF layer bits 11 -> 0xFF; bitrate idx 14 -> 0xE0,
    # 44.1 idx 0 -> byte2 0xE0; len = (12*448000//44100)*4 = 484
    l1 = bytes([0xFF, 0xFF, 0xE0, 0x00]) + b"\x00" * 480
    idx = _mp3_frame_index(l1 * 2)
    assert idx["layer"] == 1 and idx["n_frames"] == 2
    assert idx["duration_ms"] == 384 * 2 * 1000 // 44100
    assert idx["channel_mode"] == "stereo"


def test_mp3_index_error_paths():
    import pytest as _pytest

    from arrow_parquet_logs_spark.operators.multimodal import _mp3_frame_index

    with _pytest.raises(ValueError, match="sync"):
        _mp3_frame_index(b"\x00" * 16)
    with _pytest.raises(ValueError, match="no MPEG audio frames"):
        _mp3_frame_index(b"ID3\x04\x00\x00\x00\x00\x00\x00")
    # truncated final frame: walk overruns -> lost sync inside zeros
    with _pytest.raises(ValueError, match="sync|overruns"):
        _mp3_frame_index(_mp3_frame() + _mp3_frame()[:100])
    with _pytest.raises(ValueError, match="syncsafe"):
        _mp3_frame_index(b"ID3\x04\x00\x00\xff\x00\x00\x00" + _mp3_frame())
    with _pytest.raises(ValueError, match="bitrate"):
        _mp3_frame_index(bytes([0xFF, 0xFB, 0xF4, 0xC0]) + b"\x00" * 188)
    with _pytest.raises(ValueError, match="mixed sample"):
        bad = bytes([0xFF, 0xFB, 0x50, 0xC0]) + b"\x00" * 204  # 44.1kHz len 208
        _mp3_frame_index(bad + _mp3_frame())


def test_mp3_index_through_spark_pipeline(spark):
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, mp3_stream_index

    df = spark.createDataFrame(
        [(1, _mp3_frame() * 2), (2, _mp3_frame() * 5)], "id long, raw binary"
    )
    media = attach_media(df, "raw", "audio", "mp3")
    rows = {r.id: r for r in mp3_stream_index(media).collect()}
    assert rows[1].n_frames == 2 and rows[2].n_frames == 5
    assert rows[2].duration_ms == 120 and rows[2].vbr is False


# ---- JPEG EXIF index -------------------------------------------------------

def _exif_jpeg(doc=5):
    from arrow_parquet_logs_spark.queries.multimodalq import _exif_parts, _jpeg_8x8_head

    p = _exif_parts()
    orient = bytes([1 + doc % 8])
    iso = (100 + doc % 4 * 100).to_bytes(2, "big")
    d = doc % 16 * 8 + 129
    return (b"\xff\xd8" + p[0] + orient + p[1] + iso + p[2] + _jpeg_8x8_head()[2:]
            + bytes([(d >> 6) + 0xF8, d % 64 * 4 + 2]) + b"\xbf\xff\xd9")


def test_exif_baseline_and_still_decodable():
    from arrow_parquet_logs_spark.operators.multimodal import _decode_jpeg, _jpeg_exif

    got = _jpeg_exif(_exif_jpeg(7))
    assert got == {
        "byte_order": "MM", "make": "SparkCam", "model": "GraftShooter",
        "orientation": 8, "datetime": "2026:01:02 03:04:05",
        "pixel_x": 8, "pixel_y": 8, "iso": 400,
    }
    # the APP1 segment must not break the actual pixel decoder
    w, h, px = _decode_jpeg(_exif_jpeg(7))
    assert (w, h) == (8, 8)


def test_exif_little_endian_variant():
    """II byte order: same fields, every multi-byte value flipped."""
    import struct

    from arrow_parquet_logs_spark.operators.multimodal import _jpeg_exif

    make = b"LECam\x00"
    ifd0 = struct.pack("<H", 2)
    ifd0 += struct.pack("<HHI", 0x010F, 2, len(make)) + struct.pack("<I", 38)
    ifd0 += struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<HH", 5, 0)
    ifd0 += struct.pack("<I", 0)
    tiff = b"II" + struct.pack("<HI", 42, 8) + ifd0 + make
    assert len(b"II" + struct.pack("<HI", 42, 8) + ifd0) == 38
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + 6 + len(tiff)) + b"Exif\x00\x00" + tiff
    got = _jpeg_exif(b"\xff\xd8" + app1 + b"\xff\xda\x00\x02")
    assert got["byte_order"] == "II" and got["make"] == "LECam"
    assert got["orientation"] == 5 and got["iso"] is None


def test_exif_error_paths():
    import pytest as _pytest
    import struct

    from arrow_parquet_logs_spark.operators.multimodal import _jpeg_exif

    with _pytest.raises(ValueError, match="SOI"):
        _jpeg_exif(b"nope")
    with _pytest.raises(ValueError, match="no EXIF"):
        _jpeg_exif(b"\xff\xd8\xff\xda\x00\x02")
    bad = b"XX" + struct.pack(">HI", 42, 8)
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + 6 + len(bad)) + b"Exif\x00\x00" + bad
    with _pytest.raises(ValueError, match="byte-order"):
        _jpeg_exif(b"\xff\xd8" + app1)
    # IFD offset pointing past the segment
    runaway = b"MM" + struct.pack(">HI", 42, 9999)
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + 6 + len(runaway)) + b"Exif\x00\x00" + runaway
    with _pytest.raises(ValueError, match="past the APP1"):
        _jpeg_exif(b"\xff\xd8" + app1)


def test_exif_through_spark_pipeline(spark):
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, jpeg_exif_index

    df = spark.createDataFrame(
        [(1, _exif_jpeg(1)), (2, _exif_jpeg(2))], "id long, raw binary"
    )
    rows = {r.id: r for r in jpeg_exif_index(attach_media(df, "raw", "image", "jpeg")).collect()}
    assert rows[1].orientation == 2 and rows[1].iso == 200
    assert rows[2].orientation == 3 and rows[2].iso == 300
