"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY.md §2.11): media travels as a ``binary`` payload column inside
a typed struct (schema.MEDIA_STRUCT). Catalyst prunes/pushes down on the
*metadata* fields without ever touching payload bytes; the payload only
crosses into Python — Arrow-batched, via ``mapInPandas`` — in the explicitly
media-processing operators.

Decoding is three-tiered by format:

- **PPM (P6), BMP (24-bit uncompressed), uncompressed TIFF, PNG (8-bit
  gray/palette/RGB/RGBA, non-interlaced), GIF (87a/89a, full LZW +
  palettes + interlace + multi-frame), and JPEG — baseline (ITU T.81
  sequential DCT: Huffman decode, dequantization, IDCT, chroma
  upsampling, JFIF YCbCr→RGB) AND progressive (SOF2: spectral selection,
  successive approximation with EOBRUN and AC refinement correction
  bits, T.81 Annex G)** decode for REAL — plain byte layouts and
  hand-rolled entropy coders in pure numpy, with only stdlib ``zlib`` for
  the PNG inflate. **WebP lossless (VP8L)** decodes for real too — see the
  VP8L section below. Decode and nearest-neighbor resize are exact pixel
  math (JPEG is float IDCT with pinned round-half-up), byte-level tested.
- genuinely DATA-blocked formats (lossy VP8, MP3 decode, inter-frame
  video — the codec program's CLOSED final gate list, each adjudicated in
  SCALING.md r7/r8: required published table data and any verification
  vector are absent from this box, and tables typed from memory would be
  silently-wrong rather than loudly-gated):
  ``NotImplementedError`` unless ``allow_fake=True``, which
  derives deterministic pseudo-features from the payload's sha256 — the
  Spark plumbing (struct schema, Arrow batch shapes, UDF signatures,
  partition behavior) stays real and testable while the codec is a
  drop-in later.

  Why MP3 Layer III stays gated (r7 adjudication): unlike FLAC — whose
  decode is pure ALGORITHM (Rice codes, LPC, CRC polynomials, all
  closed-form) — a correct Layer III decoder requires two blocks of
  published table DATA that are not reconstructible from first
  principles: the Annex-B big-value Huffman code tables (32 arbitrary
  code tables + count1 table A) and the Table-B.3 polyphase synthesis
  window (512 tabulated prototype-filter coefficients). This offline
  environment carries no copy of either (filesystem swept r7), and with
  no reference decoder, encoder, or sample stream available there is no
  way to VERIFY tables typed from memory — a from-memory transcription
  would produce silently wrong audio, strictly worse than this loud
  gate. The framing/indexer side (header walk, bitrate/duration,
  reservoir layout) is fully implemented in ``_mp3_frame_index``.

At 100 TB: payloads dominate bytes; store them in their own parquet column
(or external object store with a URI column) so metadata-only queries never
read them — exactly what the struct layout + column pruning gives.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

from arrow_parquet_logs_spark.operators._parallel import spread_for_python

from arrow_parquet_logs_spark.schema import MEDIA_STRUCT  # noqa: F401  (public schema)

#: set True only in tests / environments without codecs.
_CODECS_AVAILABLE = False
try:  # pragma: no cover - not present in this environment
    import PIL.Image  # type: ignore # noqa: F401

    _CODECS_AVAILABLE = True
except Exception:
    pass


def attach_media(df: DataFrame, payload_col: str, media_type: str, fmt: str) -> DataFrame:
    """Wrap a binary column into the typed media struct. byte_len/sha256 are
    computed JVM-side once at attach time so later pipelines filter on them
    without re-reading payloads."""
    p = F.col(payload_col)
    return df.withColumn(
        "media",
        F.struct(
            p.alias("payload"),
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(p).cast("long").alias("byte_len"),
            F.sha2(p, 256).alias("sha256"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    ).drop(payload_col)


_DECODE_SCHEMA = (
    "id long, media_type string, byte_len long, width int, height int, "
    "n_frames int, mean_luma double"
)

#: formats decodable with no codec library — plain byte layouts (PPM/BMP/
#: uncompressed TIFF), PNG (stdlib zlib inflate + numpy unfilter), GIF
#: (hand-rolled LZW + palettes + interlace), and baseline JPEG (hand-rolled
#: Huffman + dequant + IDCT + chroma upsample, ITU T.81 sequential DCT).
RAW_DECODABLE = ("ppm", "bmp", "png", "tiff", "gif", "jpeg", "webp", "avi", "tga")


def _decode_ppm(buf: bytes):
    """Binary PPM (P6) → (width, height, HxWx3 uint8 array). Header is
    ASCII tokens (magic, width, height, maxval) with ``#`` comments,
    followed by one whitespace byte and the raster."""
    import numpy as np

    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    toks, i, n = [], 2, len(buf)
    while len(toks) < 3:
        while i < n and buf[i : i + 1].isspace():
            i += 1
        if i < n and buf[i : i + 1] == b"#":  # comment to end of line
            while i < n and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not buf[j : j + 1].isspace():
            j += 1
        toks.append(int(buf[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    raster = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=i)
    return w, h, raster.reshape(h, w, 3)


def _decode_bmp(buf: bytes):
    """24-bit uncompressed BMP → (width, height, HxWx3 uint8 RGB array).
    BITMAPINFOHEADER layout: pixel-data offset at byte 10, width/height
    (int32, height<0 = top-down) at 18/22, bpp at 28, compression at 30.
    Rows are 4-byte aligned, stored bottom-up, channels BGR."""
    import struct as _struct

    import numpy as np

    if not buf.startswith(b"BM"):
        raise ValueError("not a BMP")
    off = _struct.unpack_from("<I", buf, 10)[0]
    w, h = _struct.unpack_from("<ii", buf, 18)
    bpp = _struct.unpack_from("<H", buf, 28)[0]
    comp = _struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={comp})")
    top_down, h = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=off).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return w, h, (px if top_down else px[::-1])


def _lzw_decode_tiff(data: bytes, max_bytes: int) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first bit packing, 9→12 bit codes,
    ClearCode 256 / EOI 257, and the 'early change' — code width grows one
    entry EARLIER than GIF (when the table reaches 2^width − 1), matching
    libtiff. Hand-rolled like the GIF twin; stops after ``max_bytes``."""
    CLEAR, EOI = 256, 257
    singles = [bytes([i]) for i in range(256)]
    table = singles + [b"", b""]
    width = 9
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < max_bytes:
        while nbits < width:
            if pos >= n:
                raise ValueError("TIFF LZW stream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = singles + [b"", b""]
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW: first code after clear must be a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW: code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:  # early change
            width += 1
    return bytes(out[:max_bytes])


def _packbits_decode(data: bytes, max_bytes: int) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773): control byte n in
    0..127 copies n+1 literals; 129..255 repeats the next byte 257−n
    times; 128 is a no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < max_bytes:
        c = data[i]
        i += 1
        if c < 128:
            if i + c + 1 > n:
                raise ValueError("PackBits literal run truncated")
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:
            if i >= n:
                raise ValueError("PackBits repeat run truncated")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out[:max_bytes])


def _decode_tiff(buf: bytes):
    """Baseline TIFF (8-bit RGB or grayscale, strip layout; uncompressed,
    LZW — MSB-first early-change variant — deflate (stdlib zlib, codes 8 and
    legacy 32946) or PackBits, with the horizontal-differencing predictor)
    → (width, height, HxWx3 uint8 RGB array). Pure byte-layout parsing —
    endianness-aware header, IFD entry walk, inline-vs-offset tag values,
    per-strip decompression, multi-strip raster assembly — no codec library
    (the BMP/PPM story with a real metadata structure). JPEG-in-TIFF
    compression raises."""
    import struct as _struct

    import numpy as np

    if len(buf) < 8 or buf[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF")
    e = "<" if buf[:2] == b"II" else ">"
    magic, ifd_off = _struct.unpack_from(e + "HI", buf, 2)
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    (n_entries,) = _struct.unpack_from(e + "H", buf, ifd_off)
    _TYPE_SIZE = {1: 1, 3: 2, 4: 4}

    def values(entry_off):
        tag, typ, cnt = _struct.unpack_from(e + "HHI", buf, entry_off)
        if typ not in _TYPE_SIZE:
            return tag, None
        sz = _TYPE_SIZE[typ] * cnt
        off = entry_off + 8 if sz <= 4 else _struct.unpack_from(e + "I", buf, entry_off + 8)[0]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        return tag, list(_struct.unpack_from(e + str(cnt) + fmt, buf, off))

    tags = {}
    for i in range(n_entries):
        tag, vals = values(ifd_off + 2 + 12 * i)
        if vals is not None:
            tags[tag] = vals
    w = tags.get(256, [None])[0]
    h = tags.get(257, [None])[0]
    comp = tags.get(259, [1])[0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8])
    if w is None or h is None:
        raise ValueError("TIFF missing width/height tags")
    if comp not in (1, 5, 8, 32773, 32946):
        raise ValueError(
            f"only uncompressed/LZW/deflate/PackBits TIFF supported (compression={comp})"
        )
    if spp not in (1, 3) or any(b != 8 for b in bps):
        raise ValueError(f"only 8-bit gray/RGB TIFF supported (spp={spp}, bits={bps})")
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip offset/count tags")
    rows_per_strip = tags.get(278, [h])[0]
    pieces, row0 = [], 0
    for o, c in zip(offsets, counts):
        strip_rows = min(rows_per_strip, h - row0)
        need_strip = strip_rows * w * spp
        raw = buf[o : o + c]
        if comp == 5:
            pieces.append(_lzw_decode_tiff(raw, need_strip))
        elif comp in (8, 32946):  # Adobe/legacy deflate: a zlib stream
            import zlib

            pieces.append(zlib.decompress(raw)[:need_strip])
        elif comp == 32773:
            pieces.append(_packbits_decode(raw, need_strip))
        else:
            pieces.append(raw)
        row0 += strip_rows
    raster = b"".join(pieces)
    need = w * h * spp
    if len(raster) < need:
        raise ValueError("TIFF raster truncated")
    px = np.frombuffer(raster, dtype=np.uint8, count=need).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: un-difference per channel
        px = (px.astype(np.int64).cumsum(axis=1) % 256).astype(np.uint8)
    if spp == 1:
        px = np.repeat(px, 3, axis=2)
    return w, h, px


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: color type → samples per pixel in the filtered raster (8-bit depth only);
#: palette (3) rasters carry one index byte per pixel, resolved via PLTE
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}


def _png_unfilter(raw, h: int, w: int, ch: int):
    """Reverse the five PNG scanline filters (spec §9: None/Sub/Up/
    Average/Paeth) over the inflated raster → (h, w·ch) uint8 matrix.
    Sub is a per-lane cumulative sum (vectorized); Average/Paeth carry a
    left-pixel dependency and run as a per-pixel loop vectorized across
    channels — decode cost is per-payload and raster-bound either way."""
    import numpy as np

    stride = 1 + w * ch
    if len(raw) < stride * h:
        raise ValueError("PNG raster truncated")
    rows = np.frombuffer(raw, dtype=np.uint8, count=stride * h).reshape(h, stride)
    out = np.zeros((h, w * ch), dtype=np.int64)
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        ft = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        if ft == 0:  # None
            rec = line
        elif ft == 1:  # Sub: rec[x] = line[x] + rec[x-bpp] → lane cumsum
            rec = (line.reshape(w, ch).cumsum(axis=0) % 256).reshape(-1)
        elif ft == 2:  # Up
            rec = (line + prev) % 256
        elif ft == 3:  # Average: left-dependent, sequential in x
            rec = np.zeros(w * ch, dtype=np.int64)
            lf = line.reshape(w, ch)
            pr = prev.reshape(w, ch)
            left = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                left = (lf[x] + (left + pr[x]) // 2) % 256
                rec[x * ch : (x + 1) * ch] = left
        elif ft == 4:  # Paeth predictor, sequential in x
            rec = np.zeros(w * ch, dtype=np.int64)
            lf = line.reshape(w, ch)
            pr = prev.reshape(w, ch)
            left = np.zeros(ch, dtype=np.int64)
            ul = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                up = pr[x]
                p = left + up - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                )
                left = (lf[x] + pred) % 256
                rec[x * ch : (x + 1) * ch] = left
                ul = up
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


#: Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2). Pass k
#: holds the pixels at (x0 + i·dx, y0 + j·dy); empty passes (zero pixels
#: in either axis) contribute no scanlines to the stream.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _decode_png(buf: bytes):
    """PNG (8- or 16-bit depth, gray/palette/RGB/RGBA, sequential or
    Adam7-interlaced) → (width, height, HxWx3 uint8 RGB array) with stdlib
    ``zlib`` + numpy only: chunk walk with CRC verification,
    concatenated-IDAT inflate, scanline unfilter (PNG spec, RFC 2083).
    Gray expands to 3 equal channels; palette indexes resolve through
    PLTE; RGBA drops alpha; 16-bit samples reduce to their high byte (the
    spec's sample-depth scaling approximation) — the decode contract
    (dimensions + 8-bit RGB raster) matches the PPM/BMP tiers. Interlaced
    streams carry seven per-pass sub-images, each filtered against its own
    pass raster; decode unfilters each pass independently and scatters it
    into the final grid."""
    import struct as _struct
    import zlib

    import numpy as np

    if not buf.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    i, n = len(_PNG_SIG), len(buf)
    ihdr, idat, plte = None, [], None
    while i + 8 <= n:
        (clen,) = _struct.unpack_from(">I", buf, i)
        ctype = buf[i + 4 : i + 8]
        data = buf[i + 8 : i + 8 + clen]
        (crc,) = _struct.unpack_from(">I", buf, i + 8 + clen)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IEND":
            break
        i += 12 + clen
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = _struct.unpack(">IIBBBBB", ihdr)
    if color not in _PNG_CHANNELS or comp != 0 or filt != 0:
        raise ValueError(f"unsupported PNG color type {color}")
    if depth not in (8, 16) or (depth == 16 and color == 3):
        raise ValueError(
            f"only 8/16-bit gray/RGB/RGBA and 8-bit palette supported "
            f"(depth={depth}, color={color})"
        )
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    ch = _PNG_CHANNELS[color]
    bps = depth // 8            # bytes per sample
    bpp = ch * bps              # filter unit = bytes per pixel (spec §9)
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        raster = _png_unfilter(raw, h, w, bpp)
        px = raster.reshape(h, w, ch * bps)
    else:
        # Adam7: seven independently filtered sub-images, concatenated in
        # pass order; unfilter each against its own pass width, then
        # scatter into the (y0 + j·dy, x0 + i·dx) grid positions.
        px = np.zeros((h, w, ch * bps), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            need = ph * (1 + pw * bpp)
            sub = _png_unfilter(raw[off : off + need], ph, pw, bpp)
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, ch * bps)
            off += need
    if bps == 2:
        # 16-bit big-endian samples → high byte (spec's depth-scaling
        # approximation: floor(v / 257) ≈ v >> 8)
        px = px.reshape(h, w, ch, 2)[:, :, :, 0]
    px = px.reshape(h, w, ch)
    if color == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG missing a valid PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px.reshape(h, w)
        if idx.size and int(idx.max()) >= len(pal):
            raise ValueError("PNG palette index out of range")
        px = pal[idx]
    elif ch == 1:
        px = np.repeat(px, 3, axis=2)
    elif ch == 4:
        px = px[:, :, :3]
    return w, h, px


def _lzw_decode_gif(data: bytes, min_code_size: int, max_pixels: int) -> bytes:
    """General GIF LZW decompression → palette-index bytes. The real thing,
    not a fitted subset: LSB-first variable-width codes (min+1 .. 12 bits),
    clear-code dictionary resets, the KwKwK self-reference case, width
    growth at table size 2^width, and the deferred-clear behavior (table
    full at 4096 → stop adding, keep decoding). Stops after ``max_pixels``
    indices (trailing padding bits in the last sub-block are legal)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF LZW min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    singles = [bytes([i]) for i in range(clear)]
    table = singles + [b"", b""]
    out = bytearray()
    acc = acc_bits = pos = 0
    n = len(data)
    prev: bytes | None = None
    while len(out) < max_pixels:
        while acc_bits < width:
            if pos >= n:
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << acc_bits
            acc_bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        acc_bits -= width
        if code == clear:
            table = singles + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW: first code after clear must be a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW: code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:max_pixels])


def _gif_subblocks(buf: bytes, i: int):
    """Concatenate a GIF data sub-block sequence starting at ``i`` →
    (bytes, index just past the 0x00 terminator)."""
    parts = []
    while True:
        if i >= len(buf):
            raise ValueError("GIF sub-blocks truncated")
        sz = buf[i]
        if sz == 0:
            return b"".join(parts), i + 1
        parts.append(buf[i + 1 : i + 1 + sz])
        if len(parts[-1]) != sz:
            raise ValueError("GIF sub-blocks truncated")
        i += 1 + sz


def _gif_frames(buf: bytes):
    """GIF87a/89a → (screen_w, screen_h, [(delay_cs, HxWx3 uint8 RGB)]).
    Full structural parse: logical screen descriptor, global/local color
    tables, extension blocks (Graphic Control Extension delays are kept,
    others skipped), per-frame LZW decompression (``_lzw_decode_gif``),
    Adam-style 4-pass interlace reordering, palette resolution. Frames
    decode independently against their own palette (disposal/compositing
    against prior frames is a presentation concern, not a decode one)."""
    import struct as _struct

    import numpy as np

    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    try:
        return _gif_frames_inner(buf, _struct, np)
    except (_struct.error, IndexError) as exc:  # truncated mid-structure
        raise ValueError(f"GIF truncated or malformed: {exc}") from exc


def _gif_frames_inner(buf: bytes, _struct, np):
    sw, sh, packed = _struct.unpack_from("<HHB", buf, 6)
    i = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 7)
        gct = np.frombuffer(buf, np.uint8, ncol * 3, i).reshape(-1, 3)
        i += ncol * 3
    frames = []
    delay_cs = 0
    while i < len(buf):
        b0 = buf[i]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension block
            label = buf[i + 1]
            data, i = _gif_subblocks(buf, i + 2)
            if label == 0xF9 and len(data) >= 3:  # Graphic Control Extension
                delay_cs = _struct.unpack_from("<H", data, 1)[0]
        elif b0 == 0x2C:  # image descriptor
            _left, _top, w, h, ipacked = _struct.unpack_from("<HHHHB", buf, i + 1)
            i += 10
            lct = None
            if ipacked & 0x80:
                ncol = 2 << (ipacked & 7)
                lct = np.frombuffer(buf, np.uint8, ncol * 3, i).reshape(-1, 3)
                i += ncol * 3
            min_code = buf[i]
            data, i = _gif_subblocks(buf, i + 1)
            idx = np.frombuffer(
                _lzw_decode_gif(data, min_code, w * h), np.uint8, w * h
            ).reshape(h, w)
            if ipacked & 0x40:  # interlaced: stored row k displays at order[k]
                order = [*range(0, h, 8), *range(4, h, 8), *range(2, h, 4), *range(1, h, 2)]
                dest = np.empty_like(idx)
                dest[order] = idx
                idx = dest
            pal = lct if lct is not None else gct
            if pal is None:
                raise ValueError("GIF frame has no color table")
            if idx.size and int(idx.max()) >= len(pal):
                raise ValueError("GIF palette index out of range")
            frames.append((delay_cs, pal[idx]))
            delay_cs = 0
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        if b0 == 0x21:
            continue
    if not frames:
        raise ValueError("GIF contains no image")
    return sw, sh, frames


def _decode_gif(buf: bytes):
    """GIF → (width, height, HxWx3 uint8 RGB) of the FIRST frame — the
    single-image contract shared with the other image tiers. Multi-frame
    metadata (frame count, real GCE delays) is exposed by
    ``gif_animation_info``."""
    _, _, frames = _gif_frames(buf)
    px = frames[0][1]
    return px.shape[1], px.shape[0], px


# ---- baseline JPEG (ITU T.81 sequential DCT) — pure numpy, no codec lib ----

#: scan order index → raster position, ITU T.81 Figure A.6
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


def _jpeg_huff_table(counts: bytes, symbols: bytes) -> dict:
    """Canonical Huffman decode map {(length, code): symbol} from a DHT
    segment's 16 length counts + symbol list (ITU T.81 Annex C)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _JpegBits:
    """MSB-first bit reader over one entropy-coded segment with 0xFF00
    byte-unstuffing already applied by the caller."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.d):
                raise ValueError("JPEG entropy data truncated")
            self.acc = self.d[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """DIFF/coefficient magnitude decode (ITU T.81 F.2.2.1): ``t`` low bits
    ``v`` → signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_jpeg(buf: bytes):
    """Baseline JPEG (JFIF, sequential DCT, Huffman) → (width, height,
    HxWx3 uint8 RGB) with numpy only — marker/segment walk, DQT/DHT table
    parsing, per-MCU Huffman decode of DC diffs + AC run-lengths (EOB/ZRL),
    dequantization through the zigzag, 8×8 IDCT via the orthonormal DCT
    basis matrix, restart-marker handling (DRI), nearest-neighbor chroma
    upsampling for subsampled scans, and JFIF YCbCr→RGB with round-half-up.
    Grayscale replicates to 3 channels. Progressive (SOF2) streams route
    to _decode_jpeg_progressive_inner; arithmetic coding and 12-bit
    precision raise loudly."""
    import struct as _struct

    import numpy as np

    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    try:
        if _jpeg_sof_marker(buf, _struct) == 0xC2:
            return _decode_jpeg_progressive_inner(buf, _struct, np)
        return _decode_jpeg_inner(buf, _struct, np)
    except (_struct.error, IndexError) as exc:  # truncated mid-segment
        raise ValueError(f"JPEG truncated or malformed: {exc}") from exc


def _jpeg_sof_marker(buf: bytes, _struct) -> int | None:
    """First SOF marker in the stream (0xC0..0xCF except DHT/JPG/DAC), or
    None — decides the sequential vs progressive decode path."""
    i = 2
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            return None
        m = buf[i + 1]
        if 0xD0 <= m <= 0xD9:  # RSTn/SOI/EOI: bare markers
            i += 2
            continue
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            return m
        if m == 0xDA:
            return None  # scan before any SOF: malformed
        (seglen,) = _struct.unpack_from(">H", buf, i + 2)
        i += 2 + seglen
    return None


def _decode_jpeg_inner(buf: bytes, _struct, np):
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    sof = None
    restart_interval = 0
    scan = None
    entropy = None
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {i}")
        marker = buf[i + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = _struct.unpack_from(">H", buf, i + 2)
        seg = buf[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq != 0:
                    raise ValueError("only 8-bit quantization tables supported")
                qt[tq] = np.frombuffer(seg, np.uint8, 64, j + 1).astype(np.int32)
                j += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = seg[j + 1 : j + 17]
                nsym = sum(counts)
                symbols = seg[j + 17 : j + 17 + nsym]
                (huff_dc if tc == 0 else huff_ac)[th] = _jpeg_huff_table(counts, symbols)
                j += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline sequential
            prec, h, w, ncomp = _struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"only 8-bit precision supported (got {prec})")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = _struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"only baseline sequential JPEG supported (SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = _struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            ns = seg[0]
            scan = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15) for c in range(ns)]
            entropy = buf[i + 2 + seglen :]
            break
        # APPn/COM/anything else: skipped
        i += 2 + seglen
    if sof is None or scan is None or entropy is None:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps = sof
    if len(scan) != len(comps):
        raise ValueError("JPEG partial scans not supported (baseline single scan only)")

    # split entropy bytes into restart segments, unstuffing FF00 as we go
    segments: list[bytes] = []
    cur = bytearray()
    j = 0
    while j < len(entropy):
        b = entropy[j]
        if b == 0xFF:
            nxt = entropy[j + 1] if j + 1 < len(entropy) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                j += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
                segments.append(bytes(cur))
                cur = bytearray()
                j += 2
                continue
            break  # EOI or next marker ends the scan
        cur.append(b)
        j += 1
    segments.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    td_ta = {cid: (td, ta) for cid, td, ta in scan}
    planes = {
        cid: np.zeros((mcuy * v * 8, mcux * hh * 8), dtype=np.float64)
        for cid, hh, v, _ in comps
    }
    basis = np.array(
        [
            [
                0.5 * (1 / np.sqrt(2) if u == 0 else 1.0) * np.cos((2 * x + 1) * u * np.pi / 16)
                for u in range(8)
            ]
            for x in range(8)
        ]
    )
    zz = np.array(_JPEG_ZIGZAG)

    n_mcus = mcux * mcuy
    per_seg = restart_interval if restart_interval else n_mcus
    mcu = 0
    for seg_bytes in segments:
        if mcu >= n_mcus:
            break
        bits = _JpegBits(seg_bytes)
        preds = {cid: 0 for cid, *_ in comps}
        for _ in range(min(per_seg, n_mcus - mcu)):
            my, mx = divmod(mcu, mcux)
            for cid, ch, cv, tq in comps:
                td, ta = td_ta[cid]
                for by in range(cv):
                    for bx in range(ch):
                        t = bits.huff(huff_dc[td])
                        diff = _jpeg_extend(bits.bits(t), t)
                        preds[cid] += diff
                        coef = np.zeros(64, dtype=np.int64)
                        coef[0] = preds[cid]
                        k = 0
                        while k < 63:
                            rs = bits.huff(huff_ac[ta])
                            r, s = rs >> 4, rs & 15
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL: 16 zeros
                                k += 16
                                continue
                            k += r + 1
                            if k > 63:
                                raise ValueError("JPEG AC coefficient index overflow")
                            coef[k] = _jpeg_extend(bits.bits(s), s)
                        block = np.zeros(64, dtype=np.float64)
                        block[zz] = coef * qt[tq]
                        spatial = basis @ block.reshape(8, 8) @ basis.T
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu += 1
    if mcu < n_mcus:
        raise ValueError("JPEG entropy data ended before all MCUs decoded")

    return _jpeg_finish(planes, comps, w, h, hmax, vmax, np)


def _jpeg_finish(planes, comps, w, h, hmax, vmax, np):
    """Shared tail of the sequential and progressive decoders: crop each
    spatial plane to its component size, nearest-neighbor upsample to full
    resolution, and JFIF level-shift + YCbCr→RGB with round-half-up."""
    full = []
    for cid, ch, cv, _ in comps:
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        p = planes[cid][:chh, :cw]
        yi = np.arange(h) * cv // vmax
        xi = np.arange(w) * ch // hmax
        full.append(p[yi][:, xi])
    if len(full) == 1:
        g = np.clip(np.floor(full[0] + 128.5), 0, 255).astype(np.uint8)
        return w, h, np.repeat(g[:, :, None], 3, axis=2)
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = (f + 128.0 for f in full)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    px = np.stack([r, g, b], axis=2)
    return w, h, np.clip(np.floor(px + 0.5), 0, 255).astype(np.uint8)


def _decode_jpeg_progressive_inner(buf: bytes, _struct, np):
    """Progressive JPEG (ITU T.81 SOF2, Annex G): the last hand-rollable
    codec gap. Multiple SOS scans accumulate DCT COEFFICIENTS — spectral
    selection splits the zigzag range [Ss, Se] across scans, successive
    approximation sends each coefficient's high bits first (Ah=0 first
    pass at point transform Al, then Ah>0 one-bit refinement passes) —
    and dequantization + IDCT run once at the end over the assembled
    coefficient planes. Implements: interleaved and single-component DC
    scans, DC refinement bits, AC first scans with EOBRUN (G.1.2.2), the
    AC refinement correction-bit algorithm (G.1.2.3), per-scan Huffman
    table redefinition, and restart markers (preds + EOBRUN reset per
    RSTn segment). Shares Huffman/bit-reader/extend/IDCT/color machinery
    with the sequential decoder and finishes through _jpeg_finish."""
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    sof = None
    restart_interval = 0
    scans = []
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {i}")
        marker = buf[i + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD8:  # bare markers outside scans
            i += 2
            continue
        (seglen,) = _struct.unpack_from(">H", buf, i + 2)
        seg = buf[i + 4 : i + 2 + seglen]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq != 0:
                    raise ValueError("only 8-bit quantization tables supported")
                qt[tq] = np.frombuffer(seg, np.uint8, 64, j + 1).astype(np.int32)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = seg[j + 1 : j + 17]
                nsym = sum(counts)
                symbols = seg[j + 17 : j + 17 + nsym]
                (huff_dc if tc == 0 else huff_ac)[th] = _jpeg_huff_table(counts, symbols)
                j += 17 + nsym
        elif marker == 0xC2:
            prec, h, w, ncomp = _struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"only 8-bit precision supported (got {prec})")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = _struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (w, h, comps)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unexpected second SOF 0x{marker:02x} in progressive stream")
        elif marker == 0xDD:
            (restart_interval,) = _struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            ns = seg[0]
            sc = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15) for c in range(ns)]
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            # entropy bytes: unstuff FF00, split on RSTn, stop at any marker
            j = i + 2 + seglen
            segments: list[bytes] = []
            cur = bytearray()
            while j < len(buf):
                b = buf[j]
                if b == 0xFF:
                    nxt = buf[j + 1] if j + 1 < len(buf) else 0xD9
                    if nxt == 0x00:
                        cur.append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        segments.append(bytes(cur))
                        cur = bytearray()
                        j += 2
                        continue
                    break
                cur.append(b)
                j += 1
            segments.append(bytes(cur))
            scans.append(
                (sc, ss, se, ahal >> 4, ahal & 15, segments,
                 dict(huff_dc), dict(huff_ac), restart_interval)
            )
            i = j
            continue
        i += 2 + seglen
    if sof is None or not scans:
        raise ValueError("progressive JPEG missing SOF2/SOS")
    w, h, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    cinfo = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    # full coefficient store, zigzag order per block
    coefs = {
        cid: np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int32)
        for cid, ch, cv, _ in comps
    }

    for sc, ss, se, ah, al, segments, hdc, hac, dri in scans:
        if ss == 0 and se != 0:
            raise ValueError("JPEG DC scan must have Se=0")
        if ss > 0 and len(sc) != 1:
            raise ValueError("JPEG AC scans are single-component")
        if ss == 0:
            _jpeg_prog_dc_scan(sc, ah, al, segments, hdc, dri, cinfo,
                               coefs, mcux, mcuy, w, h, hmax, vmax)
        else:
            _jpeg_prog_ac_scan(sc[0], ss, se, ah, al, segments, hac, dri,
                               cinfo, coefs, w, h, hmax, vmax)

    # dequantize + IDCT all blocks at once (einsum over the block axes)
    basis = np.array(
        [
            [
                0.5 * (1 / np.sqrt(2) if u == 0 else 1.0) * np.cos((2 * x + 1) * u * np.pi / 16)
                for u in range(8)
            ]
            for x in range(8)
        ]
    )
    zz = np.array(_JPEG_ZIGZAG)
    planes = {}
    for cid, ch, cv, tq in comps:
        c = coefs[cid].astype(np.float64) * qt[tq][None, None, :]
        raster = np.zeros_like(c)
        raster[:, :, zz] = c
        by, bx = raster.shape[0], raster.shape[1]
        blocks = raster.reshape(by, bx, 8, 8)
        spatial = np.einsum("xu,abuv,yv->abxy", basis, blocks, basis)
        planes[cid] = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return _jpeg_finish(planes, comps, w, h, hmax, vmax, np)


def _jpeg_comp_blocks(w, h, ch, cv, hmax, vmax):
    """Non-interleaved block grid of a component: ceil(component size / 8)
    in each dimension (T.81 A.2.2)."""
    comp_w = -(-w * ch // hmax)
    comp_h = -(-h * cv // vmax)
    return -(-comp_w // 8), -(-comp_h // 8)


def _jpeg_prog_dc_scan(sc, ah, al, segments, hdc, dri, cinfo, coefs, mcux, mcuy,
                       w, h, hmax, vmax):
    """DC scan (first pass Ah=0: Huffman-coded diffs shifted by Al;
    refinement Ah>0: one raw bit per block at position Al). Interleaved
    over the scan's components in MCU order; restart segments reset the
    DC predictors."""
    def _decode_one(bits, preds, cid, td, ry, rx):
        if ah == 0:
            t = bits.huff(hdc[td])
            diff = _jpeg_extend(bits.bits(t), t)
            preds[cid] += diff
            coefs[cid][ry, rx, 0] = preds[cid] << al
        else:
            if bits.bit():
                coefs[cid][ry, rx, 0] |= 1 << al

    if len(sc) == 1:
        # non-interleaved: the component's OWN block grid (T.81 A.2.2),
        # not the MCU grid — they differ for subsampled components
        cid, td, _ = sc[0]
        ch, cv, _tq = cinfo[cid]
        bw, bh = _jpeg_comp_blocks(w, h, ch, cv, hmax, vmax)
        n_units = bw * bh
        per_seg = dri if dri else n_units
        blk = 0
        for seg_bytes in segments:
            if blk >= n_units:
                break
            bits = _JpegBits(seg_bytes)
            preds = {cid: 0}
            for _ in range(min(per_seg, n_units - blk)):
                ry, rx = divmod(blk, bw)
                _decode_one(bits, preds, cid, td, ry, rx)
                blk += 1
        if blk < n_units:
            raise ValueError("JPEG DC scan ended before all blocks decoded")
        return

    n_mcus = mcux * mcuy
    per_seg = dri if dri else n_mcus
    mcu = 0
    for seg_bytes in segments:
        if mcu >= n_mcus:
            break
        bits = _JpegBits(seg_bytes)
        preds = {cid: 0 for cid, _, _ in sc}
        for _ in range(min(per_seg, n_mcus - mcu)):
            my, mx = divmod(mcu, mcux)
            for cid, td, _ in sc:
                ch, cv, _tq = cinfo[cid]
                for by in range(cv):
                    for bx in range(ch):
                        _decode_one(bits, preds, cid, td, my * cv + by, mx * ch + bx)
            mcu += 1
    if mcu < n_mcus:
        raise ValueError("JPEG DC scan ended before all MCUs decoded")


def _jpeg_prog_ac_scan(comp, ss, se, ah, al, segments, hac, dri, cinfo, coefs,
                       w, h, hmax, vmax):
    """AC scan over ONE component's blocks in raster order (T.81 G.1.2.2
    first pass with EOBRUN; G.1.2.3 refinement with correction bits).
    Restart segments reset EOBRUN."""
    cid, _td, ta = comp
    ch, cv, _tq = cinfo[cid]
    bw, bh = _jpeg_comp_blocks(w, h, ch, cv, hmax, vmax)
    n_blocks = bw * bh
    per_seg = dri if dri else n_blocks
    table = hac[ta]
    arr = coefs[cid]
    blk = 0
    for seg_bytes in segments:
        if blk >= n_blocks:
            break
        bits = _JpegBits(seg_bytes)
        eobrun = 0
        for _ in range(min(per_seg, n_blocks - blk)):
            ry, rx = divmod(blk, bw)
            coef = arr[ry, rx]
            if ah == 0:
                eobrun = _jpeg_ac_first_block(bits, table, coef, ss, se, al, eobrun)
            else:
                eobrun = _jpeg_ac_refine_block(bits, table, coef, ss, se, al, eobrun)
            blk += 1
    if blk < n_blocks:
        raise ValueError("JPEG AC scan ended before all blocks decoded")


def _jpeg_ac_first_block(bits, table, coef, ss, se, al, eobrun):
    """G.1.2.2: first AC pass for one block — run-lengths of zeros, new
    coefficients at point transform Al, EOBn codes spanning whole blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = bits.huff(table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += bits.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC coefficient index overflow")
        coef[k] = _jpeg_extend(bits.bits(s), s) << al
        k += 1
    return eobrun


def _jpeg_ac_refine_block(bits, table, coef, ss, se, al, eobrun):
    """G.1.2.3: AC refinement for one block — newly-nonzero coefficients
    arrive as ±1<<Al; every already-nonzero coefficient crossed emits one
    correction bit that may add 1<<Al toward larger magnitude."""
    p1 = 1 << al
    k = ss

    def correct(c):
        # the correction bit is read for EVERY nonzero-history coefficient
        # crossed (even when its Al bit is already set) — conditional reads
        # would desynchronize the bit stream
        if bits.bit() and (abs(c) & p1) == 0:
            return c + (p1 if c >= 0 else -p1)
        return c

    if eobrun == 0:
        while k <= se:
            rs = bits.huff(table)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:  # EOBn: rest of this block is corrections only
                    eobrun = 1 << r
                    if r:
                        eobrun += bits.bits(r)
                    break
                val = 0  # ZRL: pass 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("JPEG AC refinement magnitude must be 1")
                val = p1 if bits.bit() else -p1
            while k <= se:
                if coef[k] != 0:
                    coef[k] = correct(coef[k])
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0:
                if k > se:
                    raise ValueError("JPEG AC refinement index overflow")
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                coef[k] = correct(coef[k])
            k += 1
        eobrun -= 1
    return eobrun




def _decode_tga(buf: bytes):
    """Truevision TGA → (width, height, HxWx3 uint8 RGB array). Types 2
    (uncompressed true-color) and 10 (RLE true-color), 24/32 bpp.
    18-byte header: id-length, colormap-type, image-type, 5-byte colormap
    spec, x/y origin, width/height (uint16 LE), bpp, descriptor (bit 5:
    top-to-bottom row order; default bottom-up). Pixels are BGR(A); RLE
    packets carry a 1+count header byte — high bit set repeats one pixel
    count+1 times, clear copies count+1 literal pixels (public spec:
    Truevision TGA File Format Specification v2.0)."""
    import struct as _struct

    import numpy as np

    if len(buf) < 18:
        raise ValueError("not a TGA: short header")
    id_len, cmap_type, itype = buf[0], buf[1], buf[2]
    if cmap_type != 0 or itype not in (2, 10):
        raise ValueError(f"unsupported TGA (cmap={cmap_type}, type={itype})")
    w, h = _struct.unpack_from("<HH", buf, 12)
    bpp, desc = buf[16], buf[17]
    if bpp not in (24, 32):
        raise ValueError(f"unsupported TGA bpp {bpp}")
    nch = bpp // 8
    i = 18 + id_len
    need = w * h * nch
    if itype == 2:
        px = np.frombuffer(buf, dtype=np.uint8, count=need, offset=i)
    else:  # RLE
        out = np.empty(need, dtype=np.uint8)
        o = 0
        while o < need:
            hdr = buf[i]
            i += 1
            count = (hdr & 0x7F) + 1
            if hdr & 0x80:  # run packet: one pixel repeated
                pix = np.frombuffer(buf, dtype=np.uint8, count=nch, offset=i)
                i += nch
                out[o : o + count * nch] = np.tile(pix, count)
            else:  # raw packet
                out[o : o + count * nch] = np.frombuffer(
                    buf, dtype=np.uint8, count=count * nch, offset=i
                )
                i += count * nch
            o += count * nch
        px = out
    px = px.reshape(h, w, nch)
    rgb = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped
    if not desc & 0x20:  # bottom-up storage (the TGA default)
        rgb = rgb[::-1]
    return w, h, np.ascontiguousarray(rgb)

def _decode_raw(fmt: str, buf: bytes):
    if fmt == "ppm":
        return _decode_ppm(buf)
    if fmt == "bmp":
        return _decode_bmp(buf)
    if fmt == "png":
        return _decode_png(buf)
    if fmt == "tiff":
        return _decode_tiff(buf)
    if fmt == "gif":
        return _decode_gif(buf)
    if fmt == "jpeg":
        return _decode_jpeg(buf)
    if fmt == "webp":
        return _decode_webp(buf)
    if fmt == "avi":
        return _decode_avi(buf)
    if fmt == "tga":
        return _decode_tga(buf)
    raise ValueError(f"format {fmt!r} is not raw-decodable")


# ---- WebP lossless (VP8L) — pure numpy/stdlib, no codec lib ----------------
#
# Implements the public "WebP Lossless Bitstream Specification" end to end:
# LSB-first bit reading, canonical prefix codes (DEFLATE convention) with
# the code-length-code indirection, simple and zero-bit single-symbol
# codes, color cache, meta prefix-code (entropy) images, LZ77 backward
# references with the 120-entry 2D distance map, and all four transforms
# (predictor with the full 14-mode set, cross-color, subtract-green,
# color-indexing with pixel packing), applied in reverse read order.
# Lossy VP8 stays behind the codec gate (it needs the boolean arithmetic
# decoder + loop filter — a different order of machinery).

class _VP8LBits:
    """LSB-first bit reader (VP8L convention — opposite of JPEG's)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0  # absolute bit position

    def bits(self, n: int) -> int:
        v = 0
        d, p = self.d, self.pos
        if (p + n - 1) >> 3 >= len(d):
            raise ValueError("VP8L bitstream truncated")
        for i in range(n):
            v |= ((d[p >> 3] >> (p & 7)) & 1) << i
            p += 1
        self.pos = p
        return v

    def bit(self) -> int:
        p = self.pos
        if p >> 3 >= len(self.d):
            raise ValueError("VP8L bitstream truncated")
        self.pos = p + 1
        return (self.d[p >> 3] >> (p & 7)) & 1


class _VP8LCode:
    """Canonical prefix decoder from a code-length vector (DEFLATE rule:
    codes assigned in (length, symbol) order, read MSB-of-code first).
    A single-symbol code consumes ZERO bits per the VP8L spec."""

    def __init__(self, lengths):
        nz = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
        if not nz:
            raise ValueError("empty VP8L prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        table = {}
        code = 0
        prev_l = nz[0][0]
        for l, s in nz:
            code <<= (l - prev_l)
            table[(l, code)] = s
            code += 1
            prev_l = l
        if code > (1 << prev_l):
            raise ValueError("over-subscribed VP8L prefix code")
        self.table = table
        self.max_len = nz[-1][0]

    def read(self, br: _VP8LBits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while length < self.max_len:
            code = (code << 1) | br.bit()
            length += 1
            s = self.table.get((length, code))
            if s is not None:
                return s
        raise ValueError("invalid VP8L prefix code")


#: code-length-code symbol transmission order (spec section 6.2.2)
_VP8L_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _vp8l_read_code(br: _VP8LBits, alphabet_size: int) -> _VP8LCode:
    """One prefix code: 'simple' (1-2 explicit symbols) or normal (symbol
    code lengths themselves prefix-coded, with 16/17/18 repeats and the
    optional max_symbol cap)."""
    if br.bit():  # simple
        num_symbols = br.bit() + 1
        if br.bit():  # first symbol is 8 bits
            sym0 = br.bits(8)
        else:
            sym0 = br.bit()
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of range")
        if num_symbols == 2:
            sym1 = br.bits(8)
            if sym1 >= alphabet_size:
                raise ValueError("VP8L simple-code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        return _VP8LCode(lengths)
    num_clc = br.bits(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_VP8L_CLC_ORDER[i]] = br.bits(3)
    clc = _VP8LCode(clc_lengths)
    if br.bit():  # length-capped symbol list
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8  # default previous nonzero length
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s != 0:
                prev = s
        elif s == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.bits(3)
        else:  # 18
            i += 11 + br.bits(7)
    return _VP8LCode(lengths)


def _vp8l_lz77_value(br: _VP8LBits, code: int) -> int:
    """Length/distance prefix value (spec 4.2.2): codes 0-3 literal, above
    that (2 + (c&1)) << extra + extra bits + 1."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _vp8l_distance_map():
    """The 120-entry 2D neighborhood for short distance codes: all (dx, dy)
    with dy in 0..8, dx in -8..8, pointing strictly backward, ordered by
    (dx²+dy², larger dy first, |dx|, positive dx first), first 120 —
    the closed form of the spec's literal table (the leading 48 entries
    are pinned against the spec list in tests)."""
    cand = []
    for dy in range(0, 9):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            cand.append((dx * dx + dy * dy, -dy, abs(dx), 0 if dx > 0 else 1, dx, dy))
    cand.sort()
    return [(dx, dy) for *_, dx, dy in cand[:120]]


_VP8L_DIST_MAP = _vp8l_distance_map()


def _vp8l_plane_to_dist(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _VP8L_DIST_MAP[code - 1]
    return max(1, dy * width + dx)


def _vp8l_decode_entropy_image(br: _VP8LBits, w: int, h: int, np, level0: bool = False,
                               transforms=None):
    """Decode one spatially-coded ARGB image (spec 'decode image stream'):
    optional transforms (level 0 only, recorded into ``transforms``),
    optional color cache, optional meta prefix-code image, then the
    entropy-coded pixels with literals / LZ77 backrefs / cache hits.
    Returns a uint32 ARGB array (h, w) — w possibly REDUCED by a
    color-indexing transform (the caller applies transforms inverse)."""
    if level0:
        while br.bit():
            ttype = br.bits(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("duplicate VP8L transform")
            if ttype == 2:  # subtract green
                transforms.append((2, None))
            elif ttype in (0, 1):  # predictor / cross-color
                size_bits = br.bits(3) + 2
                bw_ = -(-w // (1 << size_bits))
                bh_ = -(-h // (1 << size_bits))
                sub = _vp8l_decode_entropy_image(br, bw_, bh_, np)
                transforms.append((ttype, (size_bits, sub)))
            else:  # color indexing
                n_colors = br.bits(8) + 1
                pal_deltas = _vp8l_decode_entropy_image(br, n_colors, 1, np)[0]
                # palette entries are per-channel cumulative deltas
                pal = np.zeros(n_colors, np.int64)
                acc = np.zeros(4, np.int64)
                for i in range(n_colors):
                    v = int(pal_deltas[i])
                    for c in range(4):
                        acc[c] = (acc[c] + ((v >> (8 * c)) & 0xFF)) & 0xFF
                    pal[i] = (
                        int(acc[3]) << 24 | int(acc[2]) << 16
                        | int(acc[1]) << 8 | int(acc[0])
                    )
                xbits = 3 if n_colors <= 2 else 2 if n_colors <= 4 else 1 if n_colors <= 16 else 0
                transforms.append((3, (n_colors, pal, xbits, w)))
                w = -(-w // (1 << xbits))  # subsequent decode at packed width
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L color-cache bits {cache_bits} out of range")
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta_idx = None
    mbits = 0
    n_groups = 1
    if level0 and br.bit():
        mbits = br.bits(3) + 2
        mw = -(-w // (1 << mbits))
        mh = -(-h // (1 << mbits))
        meta_img = _vp8l_decode_entropy_image(br, mw, mh, np)
        meta_idx = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta_idx.max()) + 1
    groups = []
    for _ in range(n_groups):
        groups.append(
            [
                _vp8l_read_code(br, 256 + 24 + cache_size),
                _vp8l_read_code(br, 256),
                _vp8l_read_code(br, 256),
                _vp8l_read_code(br, 256),
                _vp8l_read_code(br, 40),
            ]
        )
    n = w * h
    argb = np.zeros(n, np.int64)
    cache = [0] * cache_size
    pos = 0
    g = groups[0]
    while pos < n:
        if meta_idx is not None:
            y, x = divmod(pos, w)
            g = groups[int(meta_idx[y >> mbits, x >> mbits])]
        gcode, rcode, bcode, acode, dcode = g
        s = gcode.read(br)
        if s < 256:
            red = rcode.read(br)
            blue = bcode.read(br)
            alpha = acode.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            argb[pos] = px
            pos += 1
            if cache_size:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 280:
            length = _vp8l_lz77_value(br, s - 256)
            dist_code = _vp8l_lz77_value(br, dcode.read(br))
            dist = _vp8l_plane_to_dist(dist_code, w)
            if dist > pos:
                raise ValueError("VP8L back-reference before image start")
            if pos + length > n:
                raise ValueError("VP8L back-reference overruns image")
            for _ in range(length):
                px = int(argb[pos - dist])
                argb[pos] = px
                pos += 1
                if cache_size:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        else:
            argb[pos] = cache[s - 280]
            pos += 1
    return argb.reshape(h, w)


def _vp8l_inverse_transforms(argb, transforms, np):
    """Apply recorded transforms in reverse read order (spec 4.1)."""
    for ttype, data in reversed(transforms):
        if ttype == 3:  # color indexing: unpack packed indices, map palette
            n_colors, pal, xbits, orig_w = data
            h = argb.shape[0]
            idx = ((argb >> 8) & 0xFF).astype(np.int64)
            if xbits:
                bpp = 8 >> xbits
                per = 1 << xbits
                mask = (1 << bpp) - 1
                full = np.zeros((h, orig_w), np.int64)
                xs = np.arange(orig_w)
                full[:, :] = (idx[:, xs >> xbits] >> ((xs & (per - 1)) * bpp)) & mask
                idx = full
            out = np.zeros(idx.shape, np.int64)
            valid = idx < n_colors
            out[valid] = pal[idx[valid]]
            argb = out
        elif ttype == 2:  # add green to red and blue
            green = (argb >> 8) & 0xFF
            red = ((argb >> 16) + green) & 0xFF
            blue = (argb + green) & 0xFF
            argb = (argb & 0xFF00FF00) | (red << 16) | blue
        elif ttype == 1:  # cross-color inverse
            size_bits, sub = data
            h, w = argb.shape
            ys = np.arange(h) >> size_bits
            xs = np.arange(w) >> size_bits
            cte = sub[ys][:, xs]
            g2r = ((cte & 0xFF).astype(np.int64) ^ 0x80) - 0x80          # int8
            g2b = (((cte >> 8) & 0xFF).astype(np.int64) ^ 0x80) - 0x80
            r2b = (((cte >> 16) & 0xFF).astype(np.int64) ^ 0x80) - 0x80
            green = (((argb >> 8) & 0xFF).astype(np.int64) ^ 0x80) - 0x80
            red = ((argb >> 16) & 0xFF).astype(np.int64)
            red = (red + ((g2r * green) >> 5)) & 0xFF
            red_s = (red ^ 0x80) - 0x80
            blue = (argb & 0xFF).astype(np.int64)
            blue = (blue + ((g2b * green) >> 5) + ((r2b * red_s) >> 5)) & 0xFF
            argb = (argb & 0xFF00FF00) | (red << 16) | blue
        elif ttype == 0:  # predictor inverse (sequential)
            size_bits, sub = data
            argb = _vp8l_unpredict(argb, size_bits, sub, np)
    return argb


def _vp8l_chans(p):
    return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)


def _vp8l_pack(a, r, g, b):
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)


def _vp8l_avg2(p, q):
    return _vp8l_pack(*[(x + y) >> 1 for x, y in zip(_vp8l_chans(p), _vp8l_chans(q))])


def _vp8l_unpredict(argb, size_bits, sub, np):
    """Inverse of the predictor transform: residual + prediction mod 256
    per channel, 14 modes selected per block from the sub-image's green
    channel; row 0 predicts from left, column 0 from top, origin from
    0xff000000; the top-right neighbor of a right-edge pixel is the
    current row's first pixel (the contiguous-buffer convention the
    format pins)."""
    h, w = argb.shape
    flat = argb.flatten()
    modes = ((sub >> 8) & 0xFF).astype(np.int64)

    def clamp(v):
        return 0 if v < 0 else 255 if v > 255 else v

    for pos in range(h * w):
        y, x = divmod(pos, w)
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(flat[pos - 1])
        elif x == 0:
            pred = int(flat[pos - w])
        else:
            m = int(modes[y >> size_bits, x >> size_bits])
            left = int(flat[pos - 1])
            top = int(flat[pos - w])
            tl = int(flat[pos - w - 1])
            tr = int(flat[pos - w + 1])  # x==w-1 wraps to row start (by layout)
            if m == 0:
                pred = 0xFF000000
            elif m == 1:
                pred = left
            elif m == 2:
                pred = top
            elif m == 3:
                pred = tr
            elif m == 4:
                pred = tl
            elif m == 5:
                pred = _vp8l_avg2(_vp8l_avg2(left, tr), top)
            elif m == 6:
                pred = _vp8l_avg2(left, tl)
            elif m == 7:
                pred = _vp8l_avg2(left, top)
            elif m == 8:
                pred = _vp8l_avg2(tl, top)
            elif m == 9:
                pred = _vp8l_avg2(top, tr)
            elif m == 10:
                pred = _vp8l_avg2(_vp8l_avg2(left, tl), _vp8l_avg2(top, tr))
            elif m == 11:  # Select
                lc, tc, tlc = _vp8l_chans(left), _vp8l_chans(top), _vp8l_chans(tl)
                p = [lc[i] + tc[i] - tlc[i] for i in range(4)]
                p_l = sum(abs(p[i] - lc[i]) for i in range(4))
                p_t = sum(abs(p[i] - tc[i]) for i in range(4))
                pred = left if p_l < p_t else top
            elif m == 12:  # ClampAddSubtractFull
                lc, tc, tlc = _vp8l_chans(left), _vp8l_chans(top), _vp8l_chans(tl)
                pred = _vp8l_pack(*[clamp(lc[i] + tc[i] - tlc[i]) for i in range(4)])
            elif m == 13:  # ClampAddSubtractHalf
                av = _vp8l_avg2(left, top)
                ac, tlc = _vp8l_chans(av), _vp8l_chans(tl)
                out = []
                for i in range(4):
                    d = ac[i] - tlc[i]
                    half = d // 2 if d >= 0 else -((-d) // 2)  # trunc toward 0
                    out.append(clamp(ac[i] + half))
                pred = _vp8l_pack(*out)
            else:
                raise ValueError(f"VP8L predictor mode {m} out of range")
        px = int(flat[pos])
        pc, rc = _vp8l_chans(px), _vp8l_chans(pred)
        flat[pos] = _vp8l_pack(*[(pc[i] + rc[i]) & 0xFF for i in range(4)])
    return flat.reshape(h, w)


def _decode_webp(buf: bytes):
    """WebP → (width, height, HxWx3 uint8 RGB). Lossless (VP8L) decodes
    for real; lossy (VP8) and extended (VP8X-wrapped lossy/animation)
    raise — they need the boolean arithmetic decoder, behind the codec
    gate. Alpha is decoded and then dropped (the repo's RGB contract,
    same as PNG RGBA)."""
    import struct as _struct

    import numpy as np

    if len(buf) < 20 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP header)")
    i = 12
    while i + 8 <= len(buf):
        tag = buf[i : i + 4]
        (size,) = _struct.unpack_from("<I", buf, i + 4)
        payload = buf[i + 8 : i + 8 + size]
        if tag == b"VP8L":
            return _decode_vp8l(payload, np)
        if tag in (b"VP8 ", b"VP8X"):
            raise ValueError(
                "only lossless WebP (VP8L) is raw-decodable; lossy VP8 needs "
                "the arithmetic decoder (codec gate)"
            )
        i += 8 + size + (size & 1)  # RIFF chunks pad to even
    raise ValueError("WebP without VP8L chunk")


def _decode_vp8l(payload: bytes, np):
    br = _VP8LBits(payload)
    if br.bits(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("unsupported VP8L version")
    transforms: list = []
    argb = _vp8l_decode_entropy_image(br, w, h, np, level0=True, transforms=transforms)
    argb = _vp8l_inverse_transforms(argb, transforms, np)
    if argb.shape != (h, w):
        raise ValueError("VP8L transform produced wrong image size")
    r = ((argb >> 16) & 0xFF).astype(np.uint8)
    g = ((argb >> 8) & 0xFF).astype(np.uint8)
    b = (argb & 0xFF).astype(np.uint8)
    return w, h, np.stack([r, g, b], axis=2)


# ---- AVI container (RIFF) with MJPEG / uncompressed-DIB video streams -----
#
# Motion-JPEG AVI is the one real *video* container decodable with no codec
# library: the container is plain RIFF chunk walking (Microsoft "AVI RIFF
# File Reference", a public spec), and every '..dc' frame is a complete
# baseline JPEG that reuses _decode_jpeg unchanged. '..db' frames are
# uncompressed bottom-up BGR DIB bits (dims from the avih header).
# Inter-frame codecs (H.264/VP9/...) stay behind the codec gate — they need
# real decoder libraries. The reference has no video path at all
# (reference reader.py/writer.py are log-record only); this extends the
# multimodal tier of SURVEY §2.11.


def _avi_frames(buf: bytes):
    """AVI → (width, height, usec_per_frame, [HxWx3 uint8 RGB, ...]).

    Walks the RIFF tree: 'hdrl' for the MainAVIHeader (frame timing +
    declared dims), 'movi' for the frame chunks — including frames nested
    in 'rec ' grouping lists. Honors the RIFF even-byte chunk padding and
    ignores the optional 'idx1' index (a seek aid, not data). Decoded
    frame dims are cross-checked against the header's declared dims."""
    import struct as _struct

    import numpy as np

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/'AVI ' header)")
    state = {"usec": 0, "w": 0, "h": 0}
    frames: list = []

    def walk(i: int, end: int, in_movi: bool) -> None:
        while i + 8 <= end:
            tag = buf[i : i + 4]
            (size,) = _struct.unpack_from("<I", buf, i + 4)
            body0, body1 = i + 8, i + 8 + size
            if body1 > end:
                raise ValueError("AVI chunk overruns its parent")
            if tag == b"LIST":
                ltype = buf[body0 : body0 + 4]
                walk(body0 + 4, body1, in_movi or ltype == b"movi")
            elif tag == b"avih":
                (state["usec"],) = _struct.unpack_from("<I", buf, body0)
                state["w"], state["h"] = _struct.unpack_from("<II", buf, body0 + 32)
            elif in_movi and tag[2:4] == b"dc":
                _, _, px = _decode_jpeg(buf[body0:body1])
                frames.append(px)
            elif in_movi and tag[2:4] == b"db":
                frames.append(_avi_dib_frame(buf[body0:body1], state["w"], state["h"], np))
            i = body1 + (size & 1)  # RIFF chunks pad to even

    walk(12, len(buf), False)
    if not frames:
        raise ValueError("AVI without video frames")
    h0, w0 = frames[0].shape[:2]
    if state["w"] and state["h"] and (w0, h0) != (state["w"], state["h"]):
        raise ValueError(
            f"AVI header dims {state['w']}x{state['h']} != decoded {w0}x{h0}"
        )
    return w0, h0, int(state["usec"]), frames


def _avi_dib_frame(data: bytes, width: int, height: int, np):
    """'..db' chunk: uncompressed bottom-up BGR DIB bits, rows padded to
    4 bytes — the BMP pixel-array layout without any header (dims come
    from the container's avih header)."""
    if not width or not height:
        raise ValueError("DIB frame before avih header (unknown dims)")
    stride = (width * 3 + 3) & ~3
    if len(data) < stride * height:
        raise ValueError("DIB frame shorter than stride*height")
    arr = np.frombuffer(data[: stride * height], dtype=np.uint8)
    arr = arr.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    return arr[::-1, :, ::-1].copy()  # bottom-up BGR → top-down RGB


def _decode_avi(buf: bytes):
    """AVI → (width, height, FIRST frame px) — the single-image contract
    shared with the other image tiers; multi-frame features come from
    decode_media's n_frames/all-frames-luma and video_frame_features."""
    w, h, _, frames = _avi_frames(buf)
    return w, h, frames[0]


def _container_frames(fmt: str, raw: bytes):
    """All frames of a multi-frame raw-decodable container as a list of
    HxWx3 arrays (GIF via the LZW/palette path, AVI via MJPEG/DIB)."""
    if fmt == "gif":
        _, _, frames = _gif_frames(raw)
        return [px for _, px in frames]
    if fmt == "avi":
        _, _, _, frames = _avi_frames(raw)
        return frames
    raise ValueError(f"format {fmt!r} is not a multi-frame container")


def video_frame_features(df: DataFrame, every_ms: int, id_col: str = "id") -> DataFrame:
    """REAL video frame sampling for AVI payloads via Arrow-batched
    ``mapInPandas``: decode the container, pick the frame showing at each
    ``every_ms`` tick (frame k is on screen during
    [k·spf, (k+1)·spf) with spf = dwMicroSecPerFrame), and emit one row
    per sampled frame with its exact Rec.601 luma. This *executes* the
    plan that ``frame_sample_plan`` only describes, for the one video
    container decodable without codec libraries; other formats raise
    loudly (same honesty gate as the other tiers)."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    if df.where(~F.coalesce(
        F.col("media.format") == "avi", F.lit(False)
    )).limit(1).count() > 0:
        raise NotImplementedError(
            "video_frame_features decodes real AVI (MJPEG/DIB) containers "
            "only; inter-frame video codecs need libraries absent here"
        )
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, frame_idx int, ts_ms long, luma double"

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, tss, lumas = [], [], [], []
            for rid, b in zip(pdf[id_col], pdf["payload"]):
                _, _, usec, frames = _avi_frames(bytes(b) if b is not None else b"")
                if usec <= 0:
                    raise ValueError("AVI header lacks frame timing")
                dur_ms = len(frames) * usec // 1000
                for ts in range(0, dur_ms, every_ms):
                    k = ts * 1000 // usec
                    ids.append(rid)
                    idxs.append(k)
                    tss.append(ts)
                    lumas.append(_mean_luma(frames[k]))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "ts_ms": tss, "luma": lumas}
            )

    flat = df.select(
        F.col(id_col),
        F.col("media.payload").alias("payload"),
        F.col("media.format").alias("format"),
    )
    return spread_for_python(flat).mapInPandas(sample, schema)


def _mean_luma(px) -> float:
    """Rec.601 luma mean in [0, 1], computed in integer space (1000×
    scaled weights) so the result is an exact rational — deterministic
    under any batch split or row order."""
    import numpy as np

    r, g, b = (px[:, :, c].astype(np.int64) for c in range(3))
    total = int((299 * r + 587 * g + 114 * b).sum())
    return total / (1000 * 255 * px.shape[0] * px.shape[1])


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def _mp4_boxes(buf: bytes, i: int, end: int):
    """Yield (fourcc, body_start, body_end) for the ISO-BMFF boxes in
    ``buf[i:end]`` (ISO/IEC 14496-12 §4.2): 32-bit size, size==1 →
    64-bit largesize follows the type, size==0 → box runs to ``end``."""
    import struct as _struct

    while i + 8 <= end:
        (size,) = _struct.unpack_from(">I", buf, i)
        tag = buf[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("mp4 largesize overruns file")
            (size,) = _struct.unpack_from(">Q", buf, body)
            body += 8
            box_end = i + size
        elif size == 0:
            box_end = end
        else:
            box_end = i + size
        if box_end > end or box_end < body:
            raise ValueError("mp4 box overruns its parent")
        yield tag, body, box_end
        i = box_end


def _mp4_fullbox(buf: bytes, body: int):
    """(version, flags, first-field offset) of a FullBox body."""
    return buf[body], int.from_bytes(buf[body + 1 : body + 4], "big"), body + 4


def _mp4_index(buf: bytes):
    """ISO-BMFF (MP4/MOV) container walk → per-track index dicts.

    Parses the public ISO/IEC 14496-12 structure only — ftyp brand, mvhd
    movie timescale, and per trak: tkhd (track id, 16.16 dims), mdhd
    (media timescale/duration), hdlr (handler type), stsd (codec fourcc),
    and the full sample tables (stts, stsc, stsz/stz2 uniform+table,
    stco/co64). Sample table resolution reproduces §8.7: stsc runs map
    chunks to per-chunk sample counts; a sample's file offset is its
    chunk's stco offset plus the sizes of the samples before it in that
    chunk. The first payload byte of every sample is read (bounds-checked
    against the file), proving the offset arithmetic lands on real bytes
    — the index a 100 TB video pipeline builds to slice sample ranges
    WITHOUT decoding: codec payloads stay opaque (decode stays behind the
    codec gate), while duration/timing/size/offset metadata becomes
    queryable columns."""
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (missing leading ftyp)")
    brand = buf[8:12].decode("latin-1")
    movie_timescale = 0
    tracks: list[dict] = []

    def walk_trak(body: int, end: int) -> dict:
        import struct as _struct

        tr: dict = {"track_id": 0, "width": 0, "height": 0, "handler": "",
                    "codec": "", "media_timescale": 0, "media_duration": 0,
                    "stts": [], "stsc": [], "stsz": (0, 0, []), "stco": []}

        def walk(i: int, end: int) -> None:
            for tag, b0, b1 in _mp4_boxes(buf, i, end):
                if tag in _MP4_CONTAINERS:
                    walk(b0, b1)
                elif tag == b"tkhd":
                    v, _, p = _mp4_fullbox(buf, b0)
                    tr["track_id"] = int.from_bytes(
                        buf[p + (16 if v else 8) : p + (16 if v else 8) + 4], "big"
                    )
                    # width/height: the last 8 bytes of the body, 16.16 fixed
                    (wfx, hfx) = _struct.unpack_from(">II", buf, b1 - 8)
                    tr["width"], tr["height"] = wfx >> 16, hfx >> 16
                elif tag == b"mdhd":
                    v, _, p = _mp4_fullbox(buf, b0)
                    if v:
                        tr["media_timescale"] = int.from_bytes(buf[p + 16 : p + 20], "big")
                        tr["media_duration"] = int.from_bytes(buf[p + 20 : p + 28], "big")
                    else:
                        tr["media_timescale"] = int.from_bytes(buf[p + 8 : p + 12], "big")
                        tr["media_duration"] = int.from_bytes(buf[p + 12 : p + 16], "big")
                elif tag == b"hdlr":
                    _, _, p = _mp4_fullbox(buf, b0)
                    tr["handler"] = buf[p + 4 : p + 8].decode("latin-1")
                elif tag == b"stsd":
                    _, _, p = _mp4_fullbox(buf, b0)
                    n = int.from_bytes(buf[p : p + 4], "big")
                    if n >= 1:
                        tr["codec"] = buf[p + 8 : p + 12].decode("latin-1")
                elif tag == b"stts":
                    _, _, p = _mp4_fullbox(buf, b0)
                    n = int.from_bytes(buf[p : p + 4], "big")
                    tr["stts"] = [
                        _struct.unpack_from(">II", buf, p + 4 + 8 * j) for j in range(n)
                    ]
                elif tag == b"stsc":
                    _, _, p = _mp4_fullbox(buf, b0)
                    n = int.from_bytes(buf[p : p + 4], "big")
                    tr["stsc"] = [
                        _struct.unpack_from(">III", buf, p + 4 + 12 * j) for j in range(n)
                    ]
                elif tag in (b"stsz", b"stz2"):
                    _, _, p = _mp4_fullbox(buf, b0)
                    uniform = int.from_bytes(buf[p : p + 4], "big") if tag == b"stsz" else 0
                    n = int.from_bytes(buf[p + 4 : p + 8], "big")
                    sizes = []
                    if tag == b"stsz" and uniform == 0:
                        sizes = [
                            int.from_bytes(buf[p + 8 + 4 * j : p + 12 + 4 * j], "big")
                            for j in range(n)
                        ]
                    elif tag == b"stz2":
                        fs = buf[p + 3]  # field size in bits: 4/8/16
                        if fs == 8:
                            sizes = list(buf[p + 8 : p + 8 + n])
                        elif fs == 16:
                            sizes = [
                                int.from_bytes(buf[p + 8 + 2 * j : p + 10 + 2 * j], "big")
                                for j in range(n)
                            ]
                        else:
                            raise ValueError("stz2 4-bit field size unsupported")
                    tr["stsz"] = (uniform, n, sizes)
                elif tag in (b"stco", b"co64"):
                    _, _, p = _mp4_fullbox(buf, b0)
                    n = int.from_bytes(buf[p : p + 4], "big")
                    w = 8 if tag == b"co64" else 4
                    tr["stco"] = [
                        int.from_bytes(buf[p + 4 + w * j : p + 4 + w * (j + 1)], "big")
                        for j in range(n)
                    ]

        walk(body, end)
        return tr

    def walk_top(i: int, end: int) -> None:
        nonlocal movie_timescale
        for tag, b0, b1 in _mp4_boxes(buf, i, end):
            if tag == b"moov":
                for t2, c0, c1 in _mp4_boxes(buf, b0, b1):
                    if t2 == b"mvhd":
                        v, _, p = _mp4_fullbox(buf, c0)
                        movie_timescale = int.from_bytes(
                            buf[p + (16 if v else 8) : p + (16 if v else 8) + 4], "big"
                        )
                    elif t2 == b"trak":
                        tracks.append(walk_trak(c0, c1))

    walk_top(0, len(buf))
    if not tracks:
        raise ValueError("ISO-BMFF file without a moov/trak")

    out = []
    for tr in tracks:
        uniform, n, sizes = tr["stsz"]
        n_samples = n
        if uniform:
            sizes = [uniform] * n
        if len(sizes) != n_samples:
            raise ValueError("stsz table shorter than its declared count")
        # §8.7.4 stsc runs → samples per chunk, then offsets within chunks
        per_chunk: list[int] = []
        runs, n_chunks = tr["stsc"], len(tr["stco"])
        for j, (first, spc, _desc) in enumerate(runs):
            last = runs[j + 1][0] - 1 if j + 1 < len(runs) else n_chunks
            per_chunk.extend([spc] * (last - first + 1))
        if sum(per_chunk) != n_samples:
            raise ValueError("stsc/stco chunk map disagrees with stsz count")
        first_bytes, s = [], 0
        for ci, spc in enumerate(per_chunk):
            off = tr["stco"][ci]
            for _ in range(spc):
                if off + sizes[s] > len(buf):
                    raise ValueError("sample extends past end of file")
                first_bytes.append(buf[off] if sizes[s] else 0)
                off += sizes[s]
                s += 1
        dur_ms = (
            tr["media_duration"] * 1000 // tr["media_timescale"]
            if tr["media_timescale"]
            else 0
        )
        out.append(
            {
                "track_id": tr["track_id"],
                "handler": tr["handler"],
                "codec": tr["codec"],
                "n_samples": n_samples,
                "duration_ms": dur_ms,
                "width": tr["width"],
                "height": tr["height"],
                "sample_bytes": sum(sizes),
                "sample_byte_sum": sum(first_bytes),
                "brand": brand,
            }
        )
    return out


#: ISO 11172-3 / 13818-3 bitrate tables (kbps), indexed [1..14]
_MP3_BITRATES = {
    ("MPEG1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("MPEG1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("MPEG1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("MPEG2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("MPEG2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("MPEG2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {"MPEG1": (44100, 48000, 32000), "MPEG2": (22050, 24000, 16000),
              "MPEG2.5": (11025, 12000, 8000)}


def _mp3_frame_index(buf: bytes):
    """MPEG audio frame-header walk → stream index dict, no decode.

    Skips a leading ID3v2 tag (10-byte header + syncsafe size) and a
    trailing 128-byte ID3v1 'TAG' block, then walks frame headers
    (11-bit sync, version/layer/bitrate/samplerate/padding fields per the
    public ISO 11172-3 §2.4.1.3 / 13818-3 layout), stepping exactly each
    frame's computed byte length: layer I `(12·br/sr + pad)·4`, layers
    II/III `N·br/sr + pad` with N = 144 (or 72 for MPEG2/2.5 layer III).
    Every frame must land flush on the next sync or EOF — a wrong length
    table or a missed padding bit surfaces as a hard error, not a
    silently short count. Returns frame count, exact sample-derived
    duration, bitrate stats (CBR/VBR detection), sample rate, channel
    mode, and tag byte counts — the metadata an audio corpus indexes at
    scale while the actual synthesis stays codec-gated."""
    i, id3v2 = 0, 0
    if buf[:3] == b"ID3" and len(buf) >= 10:
        size = 0
        for b in buf[6:10]:
            if b & 0x80:
                raise ValueError("ID3v2 size bytes must be syncsafe")
            size = (size << 7) | b
        id3v2 = 10 + size
        i = id3v2
    end, id3v1 = len(buf), 0
    if end - i >= 128 and buf[end - 128 : end - 125] == b"TAG":
        id3v1, end = 128, end - 128
    frames, bitrates, rate, mode, samples = 0, set(), 0, "", 0
    version = layer = None
    while i < end:
        if i + 4 > end or buf[i] != 0xFF or (buf[i + 1] & 0xE0) != 0xE0:
            raise ValueError(f"lost MPEG frame sync at byte {i}")
        vbits = (buf[i + 1] >> 3) & 0x3
        ver = {0: "MPEG2.5", 2: "MPEG2", 3: "MPEG1"}.get(vbits)
        if ver is None:
            raise ValueError("reserved MPEG version id")
        lay = {1: 3, 2: 2, 3: 1}.get((buf[i + 1] >> 1) & 0x3)
        if lay is None:
            raise ValueError("reserved MPEG layer")
        if version is None:
            version, layer = ver, lay
        elif (ver, lay) != (version, layer):
            raise ValueError("mixed MPEG version/layer mid-stream")
        bi = (buf[i + 2] >> 4) & 0xF
        if bi in (0, 15):
            raise ValueError("free-format/bad bitrate index unsupported")
        ri = (buf[i + 2] >> 2) & 0x3
        if ri == 3:
            raise ValueError("reserved sample-rate index")
        pad = (buf[i + 2] >> 1) & 1
        br = _MP3_BITRATES[("MPEG1" if ver == "MPEG1" else "MPEG2", lay)][bi - 1] * 1000
        sr = _MP3_RATES[ver][ri]
        if rate and sr != rate:
            raise ValueError("mixed sample rates mid-stream")
        rate = sr
        mode = ("stereo", "joint_stereo", "dual_channel", "mono")[(buf[i + 3] >> 6) & 0x3]
        if lay == 1:
            flen = (12 * br // sr + pad) * 4
            samples += 384
        else:
            factor = 72 if (lay == 3 and ver != "MPEG1") else 144
            flen = factor * br // sr + pad
            samples += 576 if (lay == 3 and ver != "MPEG1") else 1152
        bitrates.add(br // 1000)
        frames += 1
        i += flen
    if frames == 0:
        raise ValueError("no MPEG audio frames found")
    if i != end:
        raise ValueError("final frame overruns the stream")
    return {
        "version": version,
        "layer": layer,
        "n_frames": frames,
        "sample_rate": rate,
        "duration_ms": samples * 1000 // rate,
        "bitrate_kbps": max(bitrates),
        "vbr": len(bitrates) > 1,
        "channel_mode": mode,
        "id3v2_bytes": id3v2,
        "id3v1_bytes": id3v1,
    }


_EXIF_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}
_EXIF_TAGS_IFD0 = {0x010F: "make", 0x0110: "model", 0x0112: "orientation",
                   0x0132: "datetime"}
_EXIF_TAGS_SUB = {0xA002: "pixel_x", 0xA003: "pixel_y", 0x8827: "iso"}


def _jpeg_exif(buf: bytes):
    """JPEG marker walk → EXIF metadata dict (no pixel decode).

    Walks the marker stream from SOI for an APP1 segment carrying
    ``Exif\\0\\0``, then parses the embedded TIFF structure per the public
    EXIF/TIFF 6.0 layout: byte-order mark (II/MM) + magic 42, IFD0's
    12-byte entries (tag, type, count, inline-or-offset value — values
    whose ``size·count`` ≤ 4 live left-justified in the field, larger
    ones at an offset from the TIFF header), and the 0x8769 Exif sub-IFD.
    Extracts Make/Model/Orientation/DateTime and
    PixelXDimension/PixelYDimension/ISO — the camera-metadata index an
    image corpus builds across billions of files without ever decoding a
    pixel. All offsets are bounds-checked; a JPEG without EXIF raises
    (callers filter upstream; silence would be indistinguishable from a
    parse bug)."""
    import struct as _struct

    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i, app1 = 2, None
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            raise ValueError(f"lost JPEG marker sync at byte {i}")
        marker = buf[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA:  # SOS: entropy data follows, no EXIF past here
            break
        (seglen,) = _struct.unpack_from(">H", buf, i + 2)
        if marker == 0xE1 and buf[i + 4 : i + 10] == b"Exif\x00\x00":
            app1 = buf[i + 10 : i + 2 + seglen]
            break
        i += 2 + seglen
    if app1 is None:
        raise ValueError("JPEG carries no EXIF APP1 segment")

    if app1[:2] == b"II":
        e = "<"
    elif app1[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("EXIF TIFF header has bad byte-order mark")
    if _struct.unpack_from(e + "H", app1, 2)[0] != 42:
        raise ValueError("EXIF TIFF header magic != 42")
    (ifd0_off,) = _struct.unpack_from(e + "I", app1, 4)
    out = {"byte_order": app1[:2].decode("ascii"), "make": None, "model": None,
           "orientation": None, "datetime": None, "pixel_x": None,
           "pixel_y": None, "iso": None}

    def read_value(typ: int, cnt: int, field_off: int):
        size = _EXIF_TYPE_SIZES.get(typ)
        if size is None:
            return None
        total = size * cnt
        if total <= 4:
            off = field_off
        else:
            (off,) = _struct.unpack_from(e + "I", app1, field_off)
        if off + total > len(app1):
            raise ValueError("EXIF value runs past the APP1 segment")
        if typ == 2:  # ASCII, NUL-terminated
            return app1[off : off + cnt].split(b"\x00")[0].decode("ascii", "replace")
        if typ == 3:
            return _struct.unpack_from(e + "H", app1, off)[0]
        if typ == 4:
            return _struct.unpack_from(e + "I", app1, off)[0]
        return None

    def walk_ifd(ifd_off: int, tags: dict) -> None:
        if ifd_off + 2 > len(app1):
            raise ValueError("EXIF IFD offset past the APP1 segment")
        (n,) = _struct.unpack_from(e + "H", app1, ifd_off)
        if ifd_off + 2 + 12 * n > len(app1):
            raise ValueError("EXIF IFD entries run past the APP1 segment")
        for j in range(n):
            base = ifd_off + 2 + 12 * j
            tag, typ = _struct.unpack_from(e + "HH", app1, base)
            (cnt,) = _struct.unpack_from(e + "I", app1, base + 4)
            if tag == 0x8769:  # Exif sub-IFD pointer
                (sub,) = _struct.unpack_from(e + "I", app1, base + 8)
                walk_ifd(sub, _EXIF_TAGS_SUB)
            elif tag in tags:
                out[tags[tag]] = read_value(typ, cnt, base + 8)

    walk_ifd(ifd0_off, _EXIF_TAGS_IFD0)
    return out


def jpeg_exif_index(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Camera-metadata index over JPEG payloads via Arrow-batched
    ``mapInPandas`` — byte order, Make/Model, orientation, capture
    datetime, pixel dimensions, ISO, from the EXIF APP1 TIFF structure
    alone (``_jpeg_exif``): the third member of the container-index trio
    (MP4 sample tables, MPEG-audio frames, EXIF) — corpus-wide metadata
    without decoding a single pixel."""
    id_type = dict(df.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, byte_order string, make string, model string, "
        "orientation int, datetime string, pixel_x long, pixel_y long, iso int"
    )

    def index(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf["payload"]):
                rows.append({id_col: rid, **_jpeg_exif(bytes(b) if b is not None else b"")})
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "byte_order", "make", "model", "orientation",
                    "datetime", "pixel_x", "pixel_y", "iso",
                ],
            )

    flat = df.select(F.col(id_col), F.col("media.payload").alias("payload"))
    return spread_for_python(flat).mapInPandas(index, schema)


def mp3_stream_index(df: DataFrame, id_col: str = "id") -> DataFrame:
    """MPEG-audio stream index via Arrow-batched ``mapInPandas`` — one row
    per payload with version/layer, frame count, sample-exact duration,
    bitrate (and VBR detection), sample rate, channel mode, and ID3 tag
    sizes, from frame headers alone (``_mp3_frame_index``). The audio
    counterpart of :func:`mp4_track_index`: pure public-spec container
    math that a 100 TB audio corpus runs as its first indexing pass;
    actual MP3 synthesis (subband filterbank + IMDCT) stays behind the
    codec gate."""
    id_type = dict(df.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, version string, layer int, n_frames int, "
        "sample_rate int, duration_ms long, bitrate_kbps int, vbr boolean, "
        "channel_mode string, id3v2_bytes int, id3v1_bytes int"
    )

    def index(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf["payload"]):
                rows.append({id_col: rid, **_mp3_frame_index(bytes(b) if b is not None else b"")})
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "version", "layer", "n_frames", "sample_rate",
                    "duration_ms", "bitrate_kbps", "vbr", "channel_mode",
                    "id3v2_bytes", "id3v1_bytes",
                ],
            )

    flat = df.select(F.col(id_col), F.col("media.payload").alias("payload"))
    return spread_for_python(flat).mapInPandas(index, schema)


def mp4_track_index(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Per-track MP4/ISO-BMFF container index via Arrow-batched
    ``mapInPandas`` — one row per track with handler, codec fourcc, sample
    count, duration, dims, total sample bytes, and the sum of each
    sample's first payload byte (the offset-arithmetic proof: it requires
    resolving stsc/stsz/stco to exact file positions). This is the
    indexing stage video training pipelines run across the whole corpus —
    pure container math on the public ISO/IEC 14496-12 layout, no codec
    libraries — and its output is what a downstream (codec-gated) decode
    stage consumes to slice sample ranges without re-walking containers."""
    id_type = dict(df.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, track_id int, handler string, codec string, "
        "n_samples int, duration_ms long, width int, height int, "
        "sample_bytes long, sample_byte_sum long, brand string"
    )

    def index(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf["payload"]):
                for tr in _mp4_index(bytes(b) if b is not None else b""):
                    rows.append({id_col: rid, **tr})
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "track_id", "handler", "codec", "n_samples",
                    "duration_ms", "width", "height", "sample_bytes",
                    "sample_byte_sum", "brand",
                ],
            )

    flat = df.select(F.col(id_col), F.col("media.payload").alias("payload"))
    return spread_for_python(flat).mapInPandas(index, schema)


def decode_media(df: DataFrame, id_col: str = "id", allow_fake: bool = False) -> DataFrame:
    """Decode/feature-extract payloads via Arrow-batched ``mapInPandas``.

    PPM/BMP payloads (``media.format`` ∈ RAW_DECODABLE) decode for REAL in
    pure numpy — true width/height and exact Rec.601 mean luma. Other
    formats need codec libraries, unavailable here → ``NotImplementedError``
    unless ``allow_fake=True`` (deterministic sha-derived pseudo-decode).
    The Spark side — batch iteration, schema contract, payload pruning — is
    the production shape for every tier.
    """
    if not _CODECS_AVAILABLE and not allow_fake:
        # probe (one cheap metadata-only job, never touches payload bytes)
        # only on the gated path: raw-decodable-only frames sail through.
        # NULL format is non-decodable — coalesce keeps it in the probe
        # (bare ~isin() is NULL for NULL and would silently skip the row).
        if df.where(~F.coalesce(
            F.col("media.format").isin(*RAW_DECODABLE), F.lit(False)
        )).limit(1).count() > 0:
            raise NotImplementedError(
                "media codecs (PIL/ffmpeg) not available in this environment "
                "and the frame contains formats beyond the raw-decodable set "
                f"{RAW_DECODABLE}; pass allow_fake=True for the deterministic "
                "stub decode of those rows"
            )

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            width, height, luma, nframes = [], [], [], []
            for b, fmt in zip(pdf["payload"], pdf["format"]):
                raw = bytes(b) if b is not None else b""
                if fmt in ("gif", "avi"):
                    # The multi-frame raw containers (GIF animation, AVI
                    # MJPEG/DIB): report the real frame count and the exact
                    # mean luma across ALL frames.
                    frames = _container_frames(fmt, raw)
                    first = frames[0]
                    width.append(first.shape[1])
                    height.append(first.shape[0])
                    nframes.append(len(frames))
                    tot = npx = 0
                    for px in frames:
                        r, g, bl = (px[:, :, c].astype("int64") for c in range(3))
                        tot += int((299 * r + 587 * g + 114 * bl).sum())
                        npx += px.shape[0] * px.shape[1]
                    luma.append(tot / (1000 * 255 * npx))
                elif fmt in RAW_DECODABLE:
                    w, h, px = _decode_raw(fmt, raw)
                    width.append(w)
                    height.append(h)
                    nframes.append(1)
                    luma.append(_mean_luma(px))
                else:
                    # NULL payloads (schema allows them) hash as empty rather
                    # than exploding the whole Arrow batch with bytes(None)
                    d = hashlib.sha256(raw).digest()
                    width.append(16 + d[0] % 64)
                    height.append(16 + d[1] % 64)
                    nframes.append(1)
                    luma.append(d[2] / 255.0)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "width": width,
                    "height": height,
                    "n_frames": nframes,
                    "mean_luma": luma,
                }
            )

    flat = df.select(
        F.col(id_col).alias(id_col),
        F.col("media.payload").alias("payload"),
        F.col("media.media_type").alias("media_type"),
        F.col("media.format").alias("format"),
        F.col("media.byte_len").alias("byte_len"),
    )
    return spread_for_python(flat).mapInPandas(decode, schema=_DECODE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan* for video payloads: one output row per planned
    frame via explode over the metadata duration — no payload bytes move
    until a decode stage consumes the plan. Media with NULL or zero
    duration (images, un-probed files) contributes zero rows, not a
    spurious frame 0."""
    n = (F.coalesce(F.col("media.duration_ms"), F.lit(0)) / every_ms).cast("int")
    frames = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(F.array().cast("array<int>"))
    return df.withColumn("frame_idx", F.explode(frames)).withColumn(
        "frame_ts_ms", F.col("frame_idx") * every_ms
    )


def resize_media(
    df: DataFrame, target_w: int, target_h: int, id_col: str = "id", allow_fake: bool = False
) -> DataFrame:
    """Resize payloads to (target_w, target_h) via Arrow-batched
    ``mapInPandas`` — the thumbnail/normalization stage of an image
    training pipeline.

    PPM/BMP payloads resize for REAL: pure-numpy nearest-neighbor
    (``src_idx = floor(dst_idx · src/dst)``, the deterministic standard),
    re-encoded as binary PPM so the output is itself decodable. Other
    formats are codec-gated exactly like ``decode_media``: with
    ``allow_fake=True`` the 'resized' payload is the first
    ``target_w·target_h//64`` bytes of sha256(payload) cycled —
    deterministic in content only, with the output contract (binary column
    + digest, bounded byte size) identical to a real resize. The Spark
    shape is production-real in every tier: payload bytes cross to Python
    once, Arrow-batched, and the output payload is a fresh bounded-size
    binary column."""
    if not _CODECS_AVAILABLE and not allow_fake:
        # NULL format counts as non-decodable (see decode_media probe)
        if df.where(~F.coalesce(
            F.col("media.format").isin(*RAW_DECODABLE), F.lit(False)
        )).limit(1).count() > 0:
            raise NotImplementedError(
                "media codecs (PIL/ffmpeg) not available in this environment "
                "and the frame contains formats beyond the raw-decodable set "
                f"{RAW_DECODABLE}; pass allow_fake=True for the deterministic "
                "stub resize of those rows"
            )
    n_bytes = max(1, (target_w * target_h) // 64)
    # honor the caller's id column name AND type in the output contract
    id_type = dict(df.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, width int, height int, "
        "resized_payload binary, resized_sha256 string"
    )

    def resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            outs = []
            for b, fmt in zip(pdf["payload"], pdf["format"]):
                raw = bytes(b) if b is not None else b""
                if fmt in RAW_DECODABLE:
                    w, h, px = _decode_raw(fmt, raw)
                    yi = (np.arange(target_h) * h) // target_h
                    xi = (np.arange(target_w) * w) // target_w
                    small = px[yi][:, xi]
                    outs.append(
                        b"P6\n%d %d\n255\n" % (target_w, target_h) + small.tobytes()
                    )
                else:
                    d = hashlib.sha256(raw).digest()
                    outs.append((d * (n_bytes // len(d) + 1))[:n_bytes])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": [target_w] * len(pdf),
                    "height": [target_h] * len(pdf),
                    "resized_payload": outs,
                    "resized_sha256": [hashlib.sha256(f).hexdigest() for f in outs],
                }
            )

    flat = df.select(
        F.col(id_col).alias(id_col),
        F.col("media.payload").alias("payload"),
        F.col("media.format").alias("format"),
    )
    return spread_for_python(flat).mapInPandas(resize, schema=out_schema)


def gif_animation_info(df: DataFrame, id_col: str = "id") -> DataFrame:
    """REAL animation metadata from GIF payloads via Arrow-batched
    ``mapInPandas``: frame count, total duration in ms (sum of the parsed
    Graphic Control Extension delays × 10 — centiseconds per the GIF89a
    spec), and the exact all-frames Rec.601 mean luma. This replaces the
    probe-stub ``duration_ms`` of ``frame_sample_plan`` pipelines with a
    real container parse for the one animated format decodable here —
    ``frame_sample_plan`` consumes the returned ``duration_ms`` unchanged.
    Non-GIF formats raise loudly (same honesty gate as the other tiers)."""
    if df.where(~F.coalesce(
        F.col("media.format") == "gif", F.lit(False)
    )).limit(1).count() > 0:
        raise NotImplementedError(
            "gif_animation_info parses real GIF containers only; other "
            "video/animation formats need codec libraries absent here"
        )
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, n_frames int, duration_ms long, mean_luma double"

    def info(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            nf, dur, luma = [], [], []
            for b in pdf["payload"]:
                _, _, frames = _gif_frames(bytes(b) if b is not None else b"")
                nf.append(len(frames))
                dur.append(sum(d for d, _ in frames) * 10)
                tot = npx = 0
                for _, px in frames:
                    r, g, bl = (px[:, :, c].astype("int64") for c in range(3))
                    tot += int((299 * r + 587 * g + 114 * bl).sum())
                    npx += px.shape[0] * px.shape[1]
                luma.append(tot / (1000 * 255 * npx))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_frames": nf, "duration_ms": dur, "mean_luma": luma}
            )

    flat = df.select(
        F.col(id_col),
        F.col("media.payload").alias("payload"),
        F.col("media.format").alias("format"),
    )
    return spread_for_python(flat).mapInPandas(info, schema)


# ---- audio: real PCM WAV decode (pure byte layout, no codec libs) ----------

AUDIO_RAW_DECODABLE = ("wav", "aiff", "flac")

_AUDIO_SCHEMA = (
    "id long, sample_rate int, n_samples int, duration_us long, "
    "sum_sq long, zero_crossings int"
)


#: IMA/DVI ADPCM quantizer step table (IMA ADPCM spec, 89 entries) and the
#: 3-bit-magnitude → step-index adjustment table. Pure public constants —
#: the same tables every IMA decoder ships.
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)


def _decode_ima_adpcm(data: bytes, block_align: int):
    """IMA ADPCM (WAV format tag 0x11, mono) → int16 numpy samples. Each
    ``block_align``-byte block opens with a 4-byte header (int16 LE
    predictor — emitted verbatim as the block's first sample — and the
    step-table index), then 4-bit codes two-per-byte, LOW nibble first.
    Per code: diff = step>>3 (+step if bit2, +step>>1 if bit1, +step>>2 if
    bit0), sign from bit3, predictor clamped to int16, index stepped by
    the magnitude table and clamped to [0, 88] — exact integer arithmetic,
    replayable by a SQL oracle. Sequential by construction (each sample
    depends on the previous state), so it runs as a per-block loop;
    per-payload cost is linear in the payload."""
    import struct as _struct

    import numpy as np

    if block_align < 5:
        raise ValueError(f"IMA ADPCM block_align {block_align} too small")
    out = []
    for b0 in range(0, len(data) - block_align + 1, block_align):
        pred = _struct.unpack_from("<h", data, b0)[0]
        idx = data[b0 + 2]
        if idx > 88:
            raise ValueError(f"IMA ADPCM step index {idx} out of range")
        out.append(pred)
        for byte in data[b0 + 4 : b0 + block_align]:
            for nib in (byte & 0x0F, byte >> 4):
                step = _IMA_STEPS[idx]
                diff = step >> 3
                if nib & 4:
                    diff += step
                if nib & 2:
                    diff += step >> 1
                if nib & 1:
                    diff += step >> 2
                pred = pred - diff if nib & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + _IMA_INDEX[nib & 7]))
                out.append(pred)
    return np.asarray(out, dtype=np.int16)


#: Microsoft ADPCM (WAV format tag 0x02) public constants: the 7 standard
#: predictor coefficient pairs (×256 fixed point) and the 16-entry delta
#: adaptation table.
_MS_ADPCM_COEFFS = ((256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
                    (460, -208), (392, -232))
_MS_ADPCM_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
                   768, 614, 512, 409, 307, 230, 230, 230)


def _decode_ms_adpcm(data: bytes, block_align: int):
    """Microsoft ADPCM (format tag 0x02, mono) → int16 numpy samples. Each
    block: 7-byte header (coefficient-pair index, initial delta int16,
    sample1 int16, sample2 int16 — the two header samples are emitted
    first, older one leading), then 4-bit SIGNED codes two-per-byte, HIGH
    nibble first (the opposite nibble order of IMA). Per code:
    ``pred = trunc((s1·c1 + s2·c2)/256) + signed_nibble·delta`` clamped to
    int16, then ``delta = max(16, (adapt[nib]·delta) >> 8)``. The
    prediction division truncates toward zero (C semantics — floor would
    differ on negative numerators, and the oracle replays exactly this).
    Exact integer arithmetic end to end."""
    import struct as _struct

    import numpy as np

    if block_align < 7:
        raise ValueError(f"MS ADPCM block_align {block_align} too small")
    out = []
    for b0 in range(0, len(data) - block_align + 1, block_align):
        blk = data[b0 : b0 + block_align]
        pred_idx = blk[0]
        if pred_idx >= len(_MS_ADPCM_COEFFS):
            raise ValueError(f"MS ADPCM predictor index {pred_idx} out of range")
        c1, c2 = _MS_ADPCM_COEFFS[pred_idx]
        delta, s1, s2 = _struct.unpack_from("<hhh", blk, 1)
        out.append(s2)
        out.append(s1)
        for byte in blk[7:]:
            for nib in (byte >> 4, byte & 0x0F):  # HIGH nibble first
                signed = nib - 16 if nib & 8 else nib
                num = s1 * c1 + s2 * c2
                pred = (abs(num) // 256) * (1 if num >= 0 else -1) + signed * delta
                pred = max(-32768, min(32767, pred))
                out.append(pred)
                s2, s1 = s1, pred
                delta = max(16, (_MS_ADPCM_ADAPT[nib] * delta) >> 8)
    return np.asarray(out, dtype=np.int16)


def _ulaw_table():
    """G.711 μ-law byte → linear int16, the standard ITU expansion
    (complement, 3-bit exponent, 4-bit mantissa, +0x84 bias) — exact
    integer arithmetic, recomputable by a SQL oracle."""
    import numpy as np

    u = np.arange(256, dtype=np.int64) ^ 0xFF  # transmitted complemented
    sign = (u & 0x80) != 0
    exponent = (u >> 4) & 7
    mantissa = u & 0x0F
    magnitude = (((mantissa << 3) + 0x84) << exponent) - 0x84
    return np.where(sign, -magnitude, magnitude).astype(np.int16)


def _alaw_table():
    """G.711 A-law byte → linear int16 (XOR 0x55 toggle, segmented
    expansion; MSB set = positive)."""
    import numpy as np

    a = np.arange(256, dtype=np.int64) ^ 0x55
    seg = (a >> 4) & 7
    mantissa = a & 0x0F
    t = mantissa << 4
    mag = np.where(seg == 0, t + 8, ((t + 0x108) << np.maximum(seg - 1, 0)))
    mag = np.where(seg == 1, t + 0x108, mag)
    return np.where((a & 0x80) != 0, mag, -mag).astype(np.int16)


def _decode_wav(buf: bytes):
    """RIFF/WAVE → (sample_rate, int16 numpy samples): linear PCM16
    (format 1), G.711 A-law (6) and μ-law (7, both 8-bit, expanded through
    the exact integer ITU tables), mono or stereo, plus IMA ADPCM (0x11)
    and Microsoft ADPCM (0x02) — both 4-bit mono compressed-audio decodes
    (``_decode_ima_adpcm`` / ``_decode_ms_adpcm``).
    Pure byte-layout
    parsing (chunk walk, little-endian fields) — real audio decode with no
    codec library, the PPM/BMP story for the audio tier. Stereo downmixes
    to mono with the exact-integer mean ``(L + R) >> 1`` (floor), so
    features stay bit-deterministic."""
    import struct as _struct

    import numpy as np

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, fmt, data = 12, None, None
    while i + 8 <= len(buf):
        cid = buf[i : i + 4]
        sz = _struct.unpack_from("<I", buf, i + 4)[0]
        body = buf[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sr, _, block_align, bits = _struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if channels not in (1, 2):
        raise ValueError(f"only mono/stereo supported (ch={channels})")
    if audio_format == 1 and bits == 16:
        s = np.frombuffer(data, dtype="<i2")
    elif audio_format in (6, 7) and bits == 8:
        table = _alaw_table() if audio_format == 6 else _ulaw_table()
        s = table[np.frombuffer(data, dtype=np.uint8)]
    elif audio_format == 0x11 and bits == 4:
        if channels != 1:
            raise ValueError("IMA ADPCM: only mono supported")
        return int(sr), _decode_ima_adpcm(data, block_align)
    elif audio_format == 0x02 and bits == 4:
        if channels != 1:
            raise ValueError("MS ADPCM: only mono supported")
        return int(sr), _decode_ms_adpcm(data, block_align)
    else:
        raise ValueError(
            f"only PCM16 / G.711 A-law / G.711 mu-law / IMA ADPCM / MS ADPCM supported "
            f"(format={audio_format}, bits={bits})"
        )
    if channels == 2:
        pairs = s[: (len(s) // 2) * 2].astype(np.int64).reshape(-1, 2)
        s = ((pairs[:, 0] + pairs[:, 1]) >> 1).astype(np.int16)
    return int(sr), s


def _decode_aiff(buf: bytes):
    """AIFF (big-endian PCM16 mono/stereo) → (sample_rate, int16 numpy
    samples): FORM/AIFF container walk, COMM chunk with the 80-bit IEEE
    extended-precision sample rate decoded by hand (sign/15-bit exponent/
    64-bit explicit-one mantissa), SSND offset handling. The big-endian
    twin of ``_decode_wav`` — same downmix contract."""
    import struct as _struct

    import numpy as np

    if len(buf) < 12 or buf[:4] != b"FORM" or buf[8:12] != b"AIFF":
        raise ValueError("not an AIFF file")
    i, comm, ssnd = 12, None, None
    while i + 8 <= len(buf):
        cid = buf[i : i + 4]
        sz = _struct.unpack_from(">I", buf, i + 4)[0]
        body = buf[i + 8 : i + 8 + sz]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if comm is None or ssnd is None:
        raise ValueError("missing COMM/SSND chunk")
    channels, _nframes, bits = _struct.unpack_from(">HIH", comm, 0)
    # 80-bit extended float at COMM+8: 1 sign + 15 exponent, 64-bit mantissa
    # with an EXPLICIT integer bit (no hidden one)
    se, mant = _struct.unpack_from(">HQ", comm, 8)
    if se & 0x8000 or mant == 0:
        raise ValueError("invalid AIFF sample rate")
    exp = (se & 0x7FFF) - 16383  # value = mant · 2^(exp-63)
    shift = 63 - exp
    sr = mant >> shift if shift >= 0 else mant << (-shift)
    if bits != 16 or channels not in (1, 2):
        raise ValueError(f"only PCM16 mono/stereo AIFF supported (bits={bits}, ch={channels})")
    offset, _block = _struct.unpack_from(">II", ssnd, 0)
    s = np.frombuffer(ssnd, dtype=">i2", offset=8 + offset).astype("=i2")
    if channels == 2:
        pairs = s[: (len(s) // 2) * 2].astype(np.int64).reshape(-1, 2)
        s = ((pairs[:, 0] + pairs[:, 1]) >> 1).astype(np.int16)
    return int(sr), s


# ---- FLAC: hand-rolled lossless decode (RFC 9639 / flac format spec) -------

_FLAC_CRC8_TABLE = None
_FLAC_CRC16_TABLE = None


def _flac_crc_tables():
    """CRC-8 (poly 0x07) and CRC-16 (poly 0x8005) tables, both init 0,
    MSB-first — the FLAC frame-header and frame checksums."""
    global _FLAC_CRC8_TABLE, _FLAC_CRC16_TABLE
    if _FLAC_CRC8_TABLE is None:
        t8, t16 = [], []
        for b in range(256):
            c = b
            for _ in range(8):
                c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
            t8.append(c)
            c = b << 8
            for _ in range(8):
                c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
            t16.append(c)
        _FLAC_CRC8_TABLE, _FLAC_CRC16_TABLE = t8, t16
    return _FLAC_CRC8_TABLE, _FLAC_CRC16_TABLE


def _flac_crc8(data: bytes) -> int:
    t8, _ = _flac_crc_tables()
    c = 0
    for b in data:
        c = t8[c ^ b]
    return c


def _flac_crc16(data: bytes) -> int:
    _, t16 = _flac_crc_tables()
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ t16[(c >> 8) ^ b]
    return c


class _FlacBits:
    """MSB-first bit reader with byte-position tracking (frame CRC-16 spans
    whole byte-aligned frames)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.pos = pos  # byte position of the next unread byte
        self.acc = 0
        self.nbits = 0

    def bits(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.d):
                raise ValueError("FLAC bitstream truncated")
            self.acc = (self.acc << 8) | self.d[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.nbits -= self.nbits % 8
        # drop whole stale bytes so byte_pos is exact
        self.acc &= (1 << self.nbits) - 1

    def byte_pos(self) -> int:
        return self.pos - self.nbits // 8


def _flac_utf8_number(br: _FlacBits) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number (up to 7
    bytes — wider than real UTF-8)."""
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("invalid FLAC UTF-8 coded number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.bits(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation byte")
        v = (v << 6) | (c & 0x3F)
    return v


_FLAC_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _flac_residuals(br: _FlacBits, block_size: int, order: int) -> list:
    """Rice-coded residual section: 2-bit method (4/5-bit parameters),
    partition order, per-partition parameter with the all-raw escape."""
    method = br.bits(2)
    if method not in (0, 1):
        raise ValueError(f"reserved FLAC residual coding method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.bits(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise ValueError("FLAC partition order does not divide block size")
    out = []
    for p in range(nparts):
        n = (block_size >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC partition smaller than predictor order")
        param = br.bits(pbits)
        if param == escape:
            raw_bits = br.bits(5)
            out.extend(br.signed(raw_bits) if raw_bits else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = br.unary()
                r = br.bits(param) if param else 0
                zz = (q << param) | r
                out.append((zz >> 1) ^ -(zz & 1))  # zigzag
    return out


def _flac_subframe(br: _FlacBits, block_size: int, bps: int) -> list:
    """One subframe → list of ``block_size`` samples."""
    if br.bits(1) != 0:
        raise ValueError("invalid FLAC subframe padding bit")
    sftype = br.bits(6)
    wasted = 0
    if br.bits(1):  # wasted-bits flag: unary count - 1 follows
        wasted = br.unary() + 1
    eff = bps - wasted
    if sftype == 0:  # CONSTANT
        samples = [br.signed(eff)] * block_size
    elif sftype == 1:  # VERBATIM
        samples = [br.signed(eff) for _ in range(block_size)]
    elif 8 <= sftype <= 12:  # FIXED order 0-4
        order = sftype - 8
        samples = [br.signed(eff) for _ in range(order)]
        resid = _flac_residuals(br, block_size, order)
        coefs = _FLAC_FIXED_COEFFS[order]
        for i, e in enumerate(resid):
            pred = sum(c * samples[order + i - 1 - j] for j, c in enumerate(coefs))
            samples.append(pred + e)
    elif sftype >= 32:  # LPC order 1-32
        order = sftype - 31
        samples = [br.signed(eff) for _ in range(order)]
        prec = br.bits(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision escape")
        shift = br.signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.signed(prec) for _ in range(order)]
        resid = _flac_residuals(br, block_size, order)
        for i, e in enumerate(resid):
            pred = sum(c * samples[order + i - 1 - j] for j, c in enumerate(coefs)) >> shift
            samples.append(pred + e)
    else:
        raise ValueError(f"reserved FLAC subframe type {sftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


_FLAC_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_FLAC_RATES = {0: None, 1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_FLAC_BPS = {0: None, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _decode_flac(buf: bytes):
    """FLAC → (sample_rate, int numpy samples, downmixed like WAV/AIFF) in
    pure python/numpy: metadata-block walk (STREAMINFO), frame sync with
    CRC-8-verified headers and CRC-16-verified frames, UTF-8-coded frame
    numbers, all four subframe families (CONSTANT / VERBATIM / FIXED 0-4 /
    LPC with quantized coefficients), Rice-coded residual partitions with
    the raw-escape path, wasted-bits shifts, and left/right/mid-side
    inter-channel decorrelation. Lossless integer math end to end — the
    decoded samples are exactly the encoder's input, so features stay
    bit-deterministic (the JPEG/GIF story for compressed audio)."""
    import numpy as np

    if len(buf) < 42 or buf[:4] != b"fLaC":
        raise ValueError("not a FLAC file")
    i = 4
    streaminfo = None
    while True:
        if i + 4 > len(buf):
            raise ValueError("FLAC metadata truncated")
        hdr = buf[i]
        last, btype = hdr & 0x80, hdr & 0x7F
        blen = int.from_bytes(buf[i + 1 : i + 4], "big")
        if btype == 0:
            streaminfo = buf[i + 4 : i + 4 + blen]
        i += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC missing STREAMINFO")
    si = _FlacBits(streaminfo)
    si.bits(16), si.bits(16), si.bits(24), si.bits(24)
    si_rate = si.bits(20)
    si_channels = si.bits(3) + 1
    si_bps = si.bits(5) + 1
    total_samples = si.bits(36)
    if si_channels > 2:
        raise ValueError(f"only mono/stereo FLAC supported (ch={si_channels})")

    channels_out: list = [[] for _ in range(si_channels)]
    try:
        _decode_flac_frames(buf, i, si_channels, si_rate, si_bps, channels_out)
    except IndexError as exc:
        raise ValueError(f"FLAC truncated: {exc}") from exc
    if total_samples:
        channels_out = [c[:total_samples] for c in channels_out]
    arr = np.array(channels_out, dtype=np.int64)
    s = (arr[0] + arr[1]) >> 1 if si_channels == 2 else arr[0]
    return int(si_rate), s


def _decode_flac_frames(buf, i, si_channels, si_rate, si_bps, channels_out):
    while i < len(buf):
        frame_start = i
        if buf[i] != 0xFF or (buf[i + 1] & 0xFC) != 0xF8:
            raise ValueError("bad FLAC frame sync")
        br = _FlacBits(buf, i)
        br.bits(14), br.bits(1)
        br.bits(1)  # blocking strategy
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        ch_code = br.bits(4)
        bps_code = br.bits(3)
        br.bits(1)
        _flac_utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            block_size = br.bits(8) + 1
        elif bs_code == 7:
            block_size = br.bits(16) + 1
        else:
            block_size = _FLAC_BLOCKSIZES[bs_code]
        if sr_code == 12:
            rate = br.bits(8) * 1000
        elif sr_code == 13:
            rate = br.bits(16)
        elif sr_code == 14:
            rate = br.bits(16) * 10
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        else:
            rate = _FLAC_RATES[sr_code] or si_rate
        if bps_code in (3,):
            raise ValueError("reserved FLAC sample size code")
        bps = _FLAC_BPS[bps_code] or si_bps
        crc8_end = br.byte_pos()
        if _flac_crc8(buf[frame_start:crc8_end]) != br.bits(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            if nch != si_channels:
                raise ValueError("FLAC frame channel count differs from STREAMINFO")
            subs = [_flac_subframe(br, block_size, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if si_channels != 2:
                raise ValueError("stereo decorrelation in a non-stereo stream")
            # side channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _flac_subframe(br, block_size, bps)
                side = _flac_subframe(br, block_size, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side (side first)
                side = _flac_subframe(br, block_size, bps + 1)
                right = _flac_subframe(br, block_size, bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _flac_subframe(br, block_size, bps)
                side = _flac_subframe(br, block_size, bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    subs[0].append((m2 + s) >> 1)
                    subs[1].append((m2 - s) >> 1)
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        br.align()
        crc16_end = br.byte_pos()
        if _flac_crc16(buf[frame_start:crc16_end]) != int.from_bytes(
            buf[crc16_end : crc16_end + 2], "big"
        ):
            raise ValueError("FLAC frame CRC-16 mismatch")
        i = crc16_end + 2
        for c in range(si_channels):
            channels_out[c].extend(subs[c])


def _decode_audio(fmt: str, buf: bytes):
    if fmt == "aiff":
        return _decode_aiff(buf)
    if fmt == "flac":
        return _decode_flac(buf)
    return _decode_wav(buf)


def audio_features(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Audio feature extraction via Arrow-batched ``mapInPandas``: REAL
    WAV (PCM16 / G.711 A-law / μ-law) or AIFF decode (``media.format`` ∈
    AUDIO_RAW_DECODABLE), then exact-integer
    features — sample count, µs duration (n·10⁶ // rate), int64 energy
    (Σs²), and zero-crossing count (sign(s)=s≥0) — all rationals of int16
    samples, so the result is bit-deterministic under any batch split and
    recomputable by a SQL oracle from the same sample arithmetic. Formats
    beyond WAV would need codec libraries → loud ``NotImplementedError``
    (same honesty gate as the image tier)."""
    # NULL format counts as non-decodable: without the coalesce the probe's
    # NULL predicate would drop the row and _decode_wav would later die with
    # an opaque executor-side ValueError instead of this loud gate.
    if df.where(~F.coalesce(
        F.col("media.format").isin(*AUDIO_RAW_DECODABLE), F.lit(False)
    )).limit(1).count() > 0:
        raise NotImplementedError(
            "audio codecs not available in this environment; only raw "
            f"{AUDIO_RAW_DECODABLE} payloads decode here"
        )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            sr_l, n_l, dur, ss, zc = [], [], [], [], []
            for b, fmt in zip(pdf["payload"], pdf["format"]):
                sr, s = _decode_audio(fmt, bytes(b) if b is not None else b"")
                sr_l.append(sr)
                n_l.append(len(s))
                dur.append(len(s) * 1_000_000 // sr)
                x = s.astype("int64")
                ss.append(int((x * x).sum()))
                signs = x >= 0
                zc.append(int((signs[1:] != signs[:-1]).sum()))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "sample_rate": sr_l,
                    "n_samples": n_l,
                    "duration_us": dur,
                    "sum_sq": ss,
                    "zero_crossings": zc,
                }
            )

    flat = df.select(
        F.col(id_col).alias(id_col),
        F.col("media.payload").alias("payload"),
        F.col("media.format").alias("format"),
    )
    return spread_for_python(flat).mapInPandas(extract, schema=_AUDIO_SCHEMA)


# ---- perceptual image hashing (dHash) over REAL decoded rasters ------------


def dhash_media(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Perceptual difference-hash (dHash, the standard 9×8 form) over REAL
    decoded payloads — the image-dedup counterpart of the text tier's
    SimHash. Per image: decode (RAW_DECODABLE formats only, same honesty
    gate as ``decode_media``), integer Rec.601 luma (299R+587G+114B, no
    division — exact), nearest-neighbor resample of the luma grid to 9
    wide × 8 high, then 64 bits where bit ``r·8+c`` = luma[r,c] >
    luma[r,c+1]. All-integer, so the hash is bit-identical on any engine,
    partitioning, or batch split. Near-duplicate *images* (crops,
    re-encodes, brightness-preserving edits) land within small hamming
    distance; pair formation is ``dhash_pairs``."""
    # NULL format counts as non-decodable (see decode_media probe)
    if df.where(~F.coalesce(
        F.col("media.format").isin(*RAW_DECODABLE), F.lit(False)
    )).limit(1).count() > 0:
        raise NotImplementedError(
            "media codecs not available in this environment; dhash_media "
            f"decodes only raw {RAW_DECODABLE} payloads"
        )
    id_type = dict(df.dtypes)[id_col]

    def go(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        shifts = np.uint64(1) << np.arange(64, dtype=np.uint64)
        for pdf in batches:
            hashes = []
            for b, fmt in zip(pdf["payload"], pdf["format"]):
                _, _, px = _decode_raw(fmt, bytes(b) if b is not None else b"")
                h, w = px.shape[0], px.shape[1]
                lum = (
                    299 * px[:, :, 0].astype(np.int64)
                    + 587 * px[:, :, 1].astype(np.int64)
                    + 114 * px[:, :, 2].astype(np.int64)
                )
                yi = (np.arange(8) * h) // 8
                xi = (np.arange(9) * w) // 9
                g = lum[yi][:, xi]  # 8×9 integer luma grid
                bits = (g[:, :-1] > g[:, 1:]).reshape(-1)  # row-major r*8+c
                hv = int((bits.astype(np.uint64) * shifts).sum(dtype=np.uint64))
                hashes.append(int(np.int64(np.uint64(hv))))  # two's complement
            yield pd.DataFrame({id_col: pdf[id_col], "dhash": hashes})

    flat = df.select(
        F.col(id_col),
        F.col("media.payload").alias("payload"),
        F.col("media.format").alias("format"),
    )
    return spread_for_python(flat).mapInPandas(go, f"{id_col} {id_type}, dhash long")


def dhash_pairs(
    sigs: DataFrame, id_col: str = "id", hash_col: str = "dhash", max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate image pairs with hamming(dhash) ≤ ``max_hamming`` via
    4-chunk pigeonhole banding (the text SimHash recipe on a 64-bit hash):
    two hashes within hamming 3 agree exactly on ≥1 of 4 disjoint 16-bit
    chunks, so an equi-join on (chunk_idx, chunk_value) has guaranteed
    recall at index-join cost — never an all-pairs scan.
    ``shiftrightunsigned`` keeps chunk extraction correct when bit 63 is
    set (dhash is a two's-complement int64)."""
    chunks = sigs.select(
        F.col(id_col).alias("sid"), F.col(hash_col).alias("sig"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("c"),
    ).selectExpr(
        "sid", "sig",
        "concat(c, ':', shiftrightunsigned(sig, c * 16) & 65535) AS chunk_key",
    )
    a = chunks.select(F.col("sid").alias("a_id"), F.col("sig").alias("a_sig"), "chunk_key")
    b = chunks.select(F.col("sid").alias("b_id"), F.col("sig").alias("b_sig"), "chunk_key")
    return (
        a.join(b, "chunk_key")
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sig", "b_sig")
        .distinct()
        .selectExpr("a_id", "b_id", "CAST(bit_count(a_sig ^ b_sig) AS INT) AS hamming")
        .where(F.col("hamming") <= max_hamming)
    )
