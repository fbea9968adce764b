"""Multimodal metadata query: binary payload plumbing with an oracle.

``documents.text`` bytes stand in for an opaque payload column — the query
exercises binary casting, byte-length metadata, and content digests, all
JVM-side, with sha256 hex identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from arrow_parquet_logs_spark.queries.catalog import register
from arrow_parquet_logs_spark.sources.tables import load_table


@register(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id AS id,
           'image' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(16 + CAST(concat('0x', substr(sha256(text), 1, 2)) AS INTEGER) % 64 AS INTEGER) AS width,
           CAST(16 + CAST(concat('0x', substr(sha256(text), 3, 2)) AS INTEGER) % 64 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS n_frames,
           CAST(concat('0x', substr(sha256(text), 5, 2)) AS INTEGER) / 255.0 AS mean_luma
    FROM documents ORDER BY id
    """,
    tags=("multimodal", "pandas-udf"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal pipeline — attach_media struct wrapping →
    Arrow-batched mapInPandas decode — with a real oracle: the stub decode
    derives features from the payload's sha256 digest bytes, which SQL can
    recompute from the hex digest. This puts the pandas-UDF execution path
    itself (batch iteration, schema contract, Arrow round-trip) under the
    driver's hash gate, not just unit tests."""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, decode_media

    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(
        docs.select("doc_id", F.col("text").cast("binary").alias("raw")), "raw", "image", "heic"
    )
    return decode_media(media, id_col="doc_id", allow_fake=True).orderBy("id")


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
           sha256(text) AS payload_sha256
    FROM documents ORDER BY doc_id
    """,
    tags=("multimodal", "binary"),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads (operators.multimodal):
    length + digest computed without any Python in the loop."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("int").alias("byte_len"),
        F.sha2(payload, 256).alias("payload_sha256"),
    ).orderBy("doc_id")


@register(
    "multimodal_frame_plan",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               CAST(concat('0x', substr(sha256(text), 7, 4)) AS INTEGER) % 5000 + 500 AS duration_ms
        FROM documents WHERE doc_id < 100
    ),
    f AS (
        SELECT doc_id, CAST(duration_ms AS BIGINT) AS duration_ms,
               CAST(floor(duration_ms / 1000.0) AS INT) AS n
        FROM m
    )
    SELECT doc_id, duration_ms, CAST(i AS INT) AS frame_idx,
           CAST(i * 1000 AS BIGINT) AS frame_ts_ms
    FROM f, unnest(range(0, n)) AS u(i)
    ORDER BY doc_id, frame_idx
    """,
    tags=("multimodal", "video", "explode"),
)
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan under the hash gate: payloads wrap into the
    media struct, a probe stage fills duration_ms (stubbed here as a
    sha256-derived value the oracle recomputes — real codecs are env-gated),
    and frame_sample_plan explodes one row per planned 1 Hz frame. Media
    shorter than one interval contributes zero rows, not a spurious frame 0.
    Row-local expansion — no payload bytes move until a decode consumes the
    plan, and no shuffle at all until the final presentation sort."""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, frame_sample_plan

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    media = attach_media(
        docs.select("doc_id", F.col("text").cast("binary").alias("raw")), "raw", "video", "mp4"
    )
    dur = (
        F.conv(F.substring(F.sha2(F.col("media.payload"), 256), 7, 4), 16, 10).cast("int") % 5000
        + 500
    ).cast("long")
    probed = media.withColumn("media", F.col("media").withField("duration_ms", dur))
    plan = frame_sample_plan(probed, every_ms=1000)
    return plan.select(
        "doc_id",
        F.col("media.duration_ms").alias("duration_ms"),
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx").cast("bigint") * 1000).alias("frame_ts_ms"),
    ).orderBy("doc_id", "frame_idx")


@register(
    "multimodal_real_ppm_decode",
    oracle="""
    WITH px AS (
        SELECT doc_id,
               (doc_id * 7) % 256 AS r0, (doc_id * 11) % 256 AS g0, (doc_id * 13) % 256 AS b0,
               (doc_id * 17) % 256 AS r1, (doc_id * 19) % 256 AS g1, (doc_id * 23) % 256 AS b1,
               (doc_id * 29) % 256 AS r2, (doc_id * 31) % 256 AS g2, (doc_id * 37) % 256 AS b2,
               (doc_id * 41) % 256 AS r3, (doc_id * 43) % 256 AS g3, (doc_id * 47) % 256 AS b3
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id AS id, 'image' AS media_type,
           CAST(23 AS BIGINT) AS byte_len,
           CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS n_frames,
           (  299*(r0+r1+r2+r3) + 587*(g0+g1+g2+g3) + 114*(b0+b1+b2+b3)
           ) / (1000.0 * 255 * 4) AS mean_luma
    FROM px ORDER BY id
    """,
    tags=("multimodal", "pandas-udf", "decode"),
)
def multimodal_real_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decoding under the driver's hash gate — no stub, no codec
    library. The query synthesizes a valid 2×2 binary PPM (P6) per document
    with pixel channels derived arithmetically from doc_id (bytes built
    JVM-side via unhex), runs it through the pure-numpy decoder
    (operators.multimodal.decode_media, RAW_DECODABLE path — note: NOT
    allow_fake), and the oracle recomputes the expected dimensions and the
    exact integer-rational Rec.601 mean luma from the same doc_id
    arithmetic. A byte-level decoder bug — header parsing, raster offset,
    channel order — lands as a hash mismatch."""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, decode_media

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)

    def byte(mult: int):
        return F.unhex(F.lpad(F.hex((F.col("doc_id") * mult) % 256), 2, "0"))

    header = F.lit(b"P6\n2 2\n255\n")
    raster = F.concat(*[byte(m) for m in (7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47)])
    payload = F.concat(header, raster)
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "image", "ppm")
    return decode_media(media, id_col="doc_id").orderBy("id")


@register(
    "multimodal_real_ppm_resize",
    oracle="""
    WITH px AS (
        SELECT doc_id,
               lpad(hex((doc_id * 7) % 256), 2, '0')  AS r0,
               lpad(hex((doc_id * 11) % 256), 2, '0') AS g0,
               lpad(hex((doc_id * 13) % 256), 2, '0') AS b0
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id, CAST(1 AS INTEGER) AS width, CAST(1 AS INTEGER) AS height,
           hex(encode('P6' || chr(10) || '1 1' || chr(10) || '255' || chr(10))
               || unhex(r0 || g0 || b0)) AS resized_hex
    FROM px ORDER BY doc_id
    """,
    tags=("multimodal", "pandas-udf", "decode", "resize"),
)
def multimodal_real_ppm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resizing under the hash gate: the same synthesized 2×2
    PPMs as `multimodal_real_ppm_decode`, downsampled to 1×1 by the
    pure-numpy nearest-neighbor resize (src = floor(dst·src/dst) picks
    pixel (0,0)) and re-encoded as PPM — the oracle rebuilds the expected
    output file byte-for-byte (header + the (0,0) channels from the same
    doc_id arithmetic) and compares hex. Pins raster indexing, channel
    order, and the re-encode header in one driver-checkable row per doc."""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, resize_media

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)

    def byte(mult: int):
        return F.unhex(F.lpad(F.hex((F.col("doc_id") * mult) % 256), 2, "0"))

    header = F.lit(b"P6\n2 2\n255\n")
    raster = F.concat(*[byte(m) for m in (7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47)])
    media = attach_media(
        docs.select("doc_id", F.concat(header, raster).alias("raw")), "raw", "image", "ppm"
    )
    out = resize_media(media, 1, 1, id_col="doc_id")
    return out.select(
        "doc_id", "width", "height", F.hex("resized_payload").alias("resized_hex")
    ).orderBy("doc_id")


def _png_2x2_payload():
    """Catalyst expression for a fully valid 2×2 RGB PNG derived from
    ``doc_id``: signature + constant IHDR/IEND chunks, an IDAT whose zlib
    stream uses a stored (uncompressed) deflate block so the scanline bytes
    are expressible JVM-side, Adler-32 folded symbolically over the known
    byte values, and the chunk CRC via the built-in ``F.crc32``. Row 1 is
    filter-0 (None); row 2 is filter-2 (Up), so decoding exercises real
    scanline UNFILTERING. Pixel channels: row 1 = doc_id·(53,59,61 |
    67,71,73) % 256, row 2 = doc_id·(79,83,89 | 97,101,103) % 256."""
    import struct as _struct
    import zlib as _zlib

    def ch(mult: int):
        return (F.col("doc_id") * mult) % 256

    row1 = [ch(m) for m in (53, 59, 61, 67, 71, 73)]      # pixels (0,0),(0,1)
    row2 = [ch(m) for m in (79, 83, 89, 97, 101, 103)]    # pixels (1,0),(1,1)
    # row 2 stored Up-filtered: delta vs the pixel directly above
    deltas = [F.pmod(b - a, F.lit(256)) for a, b in zip(row1, row2)]
    # the 14 raw raster bytes (values): filter 0 + row1, filter 2 + deltas
    vals = [F.lit(0), *row1, F.lit(2), *deltas]

    # Adler-32 over the raw scanlines, folded symbolically:
    # A = 1 + Σb_i ; B = n + Σ (n-i+1)·b_i  (both < 65521 here, mod is a no-op)
    n = len(vals)
    a_sum = F.lit(1)
    b_sum = F.lit(n)
    for i, v in enumerate(vals, start=1):
        a_sum = a_sum + v
        b_sum = b_sum + v * (n - i + 1)
    adler = F.unhex(
        F.concat(
            F.lpad(F.hex(b_sum % 65521), 4, "0"), F.lpad(F.hex(a_sum % 65521), 4, "0")
        )
    )

    def byte(v):
        return F.unhex(F.lpad(F.hex(v), 2, "0"))

    # zlib stream: header 78 01, stored-block header (BFINAL=1, BTYPE=00,
    # LEN=14 LE, NLEN=~LEN), raw scanlines, Adler-32 (BE)
    zstream = F.concat(
        F.lit(b"\x78\x01\x01\x0e\x00\xf1\xff"), *[byte(v) for v in vals], adler
    )
    idat_td = F.concat(F.lit(b"IDAT"), zstream)
    idat_crc = F.unhex(F.lpad(F.hex(F.crc32(idat_td)), 8, "0"))

    ihdr_data = _struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    head = (
        b"\x89PNG\r\n\x1a\n"
        + _struct.pack(">I", 13) + b"IHDR" + ihdr_data
        + _struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr_data) & 0xFFFFFFFF)
        + _struct.pack(">I", 25)  # IDAT length: 2+5+14+4
    )
    iend = _struct.pack(">I", 0) + b"IEND" + _struct.pack(">I", _zlib.crc32(b"IEND") & 0xFFFFFFFF)
    return F.concat(F.lit(head), idat_td, idat_crc, F.lit(iend))


@register(
    "multimodal_real_png_decode",
    oracle="""
    WITH px AS (
        SELECT doc_id,
               (doc_id * 53) % 256 AS r0, (doc_id * 59) % 256 AS g0, (doc_id * 61) % 256 AS b0,
               (doc_id * 67) % 256 AS r1, (doc_id * 71) % 256 AS g1, (doc_id * 73) % 256 AS b1,
               (doc_id * 79) % 256 AS r2, (doc_id * 83) % 256 AS g2, (doc_id * 89) % 256 AS b2,
               (doc_id * 97) % 256 AS r3, (doc_id * 101) % 256 AS g3, (doc_id * 103) % 256 AS b3
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id AS id, 'image' AS media_type,
           CAST(82 AS BIGINT) AS byte_len,
           CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS n_frames,
           (  299*(r0+r1+r2+r3) + 587*(g0+g1+g2+g3) + 114*(b0+b1+b2+b3)
           ) / (1000.0 * 255 * 4) AS mean_luma
    FROM px ORDER BY id
    """,
    tags=("multimodal", "pandas-udf", "decode", "png"),
)
def multimodal_real_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decoding under the driver's hash gate — stdlib zlib + numpy,
    no codec library (operators.multimodal._decode_png). The query
    synthesizes a fully valid 2×2 RGB PNG per document ENTIRELY in Catalyst
    expressions (see ``_png_2x2_payload``), decodes it for real, and the
    oracle recomputes the expected Rec.601 mean luma from the *unfiltered*
    pixel arithmetic — any chunk-walk/inflate/unfilter bug lands as a hash
    mismatch. (Sub/Average/Paeth filters + gray/palette/RGBA color types
    are pinned byte-level in tests/test_operators.py.)"""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, decode_media

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = attach_media(
        docs.select("doc_id", _png_2x2_payload().alias("raw")), "raw", "image", "png"
    )
    return decode_media(media, id_col="doc_id").orderBy("id")


@register(
    "multimodal_real_png_resize",
    oracle="""
    WITH px AS (
        SELECT doc_id,
               lpad(hex((doc_id * 53) % 256), 2, '0') AS r0,
               lpad(hex((doc_id * 59) % 256), 2, '0') AS g0,
               lpad(hex((doc_id * 61) % 256), 2, '0') AS b0
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id, CAST(1 AS INTEGER) AS width, CAST(1 AS INTEGER) AS height,
           hex(encode('P6' || chr(10) || '1 1' || chr(10) || '255' || chr(10))
               || unhex(r0 || g0 || b0)) AS resized_hex
    FROM px ORDER BY doc_id
    """,
    tags=("multimodal", "pandas-udf", "decode", "resize", "png"),
)
def multimodal_real_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG → decode → resize → PPM re-encode under the hash gate: the
    same synthesized 2×2 PNGs as `multimodal_real_png_decode` (Up-filtered
    second row), downsampled to 1×1 by the pure-numpy nearest-neighbor
    resize (src = floor(dst·src/dst) picks pixel (0,0)) — so the full
    inflate/unfilter path feeds the resize, and the oracle rebuilds the
    expected output file byte-for-byte from the (0,0) channel arithmetic."""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, resize_media

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = attach_media(
        docs.select("doc_id", _png_2x2_payload().alias("raw")), "raw", "image", "png"
    )
    out = resize_media(media, 1, 1, id_col="doc_id")
    return out.select(
        "doc_id", "width", "height", F.hex("resized_payload").alias("resized_hex")
    ).orderBy("doc_id")


def _png_2x2_interlaced_payload():
    """Catalyst expression for a fully valid Adam7-INTERLACED 2×2 RGB PNG
    from ``doc_id`` — the interlaced twin of ``_png_2x2_payload``. A 2×2
    grid populates three Adam7 passes: pass 1 holds (0,0), pass 6 holds
    (1,0), pass 7 holds the bottom row — so the stored-deflate stream is
    three sub-images with their own filter bytes (pass 7 uses Sub, pinning
    per-pass unfiltering: its second pixel is stored as a left-delta that
    only reconstructs inside the pass raster). Same stored-block +
    symbolic-Adler + ``F.crc32`` machinery as the sequential payload."""
    import struct as _struct
    import zlib as _zlib

    def ch(mult: int):
        return (F.col("doc_id") * mult) % 256

    p00 = [ch(m) for m in (53, 59, 61)]
    p10 = [ch(m) for m in (67, 71, 73)]
    p01 = [ch(m) for m in (79, 83, 89)]
    p11 = [ch(m) for m in (97, 101, 103)]
    # pass 7 scanline Sub-filtered: second pixel is a left-delta
    deltas = [F.pmod(b - a, F.lit(256)) for a, b in zip(p01, p11)]
    vals = [F.lit(0), *p00, F.lit(0), *p10, F.lit(1), *p01, *deltas]

    n = len(vals)  # 15 stored bytes
    a_sum = F.lit(1)
    b_sum = F.lit(n)
    for i, v in enumerate(vals, start=1):
        a_sum = a_sum + v
        b_sum = b_sum + v * (n - i + 1)
    adler = F.unhex(
        F.concat(
            F.lpad(F.hex(b_sum % 65521), 4, "0"), F.lpad(F.hex(a_sum % 65521), 4, "0")
        )
    )

    def byte(v):
        return F.unhex(F.lpad(F.hex(v), 2, "0"))

    zstream = F.concat(
        F.lit(b"\x78\x01\x01\x0f\x00\xf0\xff"), *[byte(v) for v in vals], adler
    )
    idat_td = F.concat(F.lit(b"IDAT"), zstream)
    idat_crc = F.unhex(F.lpad(F.hex(F.crc32(idat_td)), 8, "0"))

    ihdr_data = _struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # interlace=1
    head = (
        b"\x89PNG\r\n\x1a\n"
        + _struct.pack(">I", 13) + b"IHDR" + ihdr_data
        + _struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr_data) & 0xFFFFFFFF)
        + _struct.pack(">I", 26)  # IDAT length: 2+5+15+4
    )
    iend = _struct.pack(">I", 0) + b"IEND" + _struct.pack(">I", _zlib.crc32(b"IEND") & 0xFFFFFFFF)
    return F.concat(F.lit(head), idat_td, idat_crc, F.lit(iend))


@register(
    "multimodal_real_png_interlaced",
    oracle="""
    WITH px AS (
        SELECT doc_id,
               (doc_id * 53) % 256 AS r0, (doc_id * 59) % 256 AS g0, (doc_id * 61) % 256 AS b0,
               (doc_id * 67) % 256 AS r1, (doc_id * 71) % 256 AS g1, (doc_id * 73) % 256 AS b1,
               (doc_id * 79) % 256 AS r2, (doc_id * 83) % 256 AS g2, (doc_id * 89) % 256 AS b2,
               (doc_id * 97) % 256 AS r3, (doc_id * 101) % 256 AS g3, (doc_id * 103) % 256 AS b3
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id AS id, 'image' AS media_type,
           CAST(83 AS BIGINT) AS byte_len,
           CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS n_frames,
           (  299*(r0+r1+r2+r3) + 587*(g0+g1+g2+g3) + 114*(b0+b1+b2+b3)
           ) / (1000.0 * 255 * 4) AS mean_luma
    FROM px ORDER BY id
    """,
    tags=("multimodal", "pandas-udf", "decode", "png", "interlace"),
)
def multimodal_real_png_interlaced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Adam7-interlaced PNG decoding under the driver's hash gate: a
    2×2 interlaced PNG per document (three Adam7 passes, the last one
    Sub-filtered inside its own pass raster — see
    ``_png_2x2_interlaced_payload``) decodes through the per-pass
    unfilter-and-scatter path (operators.multimodal._decode_png), and the
    oracle recomputes the Rec.601 mean luma from the un-interlaced pixel
    arithmetic. A pass-ordering, pass-width, or scatter-stride bug moves a
    pixel to the wrong grid cell and lands as a hash mismatch. (Larger
    interlaced and 16-bit rasters are pinned byte-level against
    zlib-compressed streams in tests/test_operators.py.)"""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, decode_media

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = attach_media(
        docs.select("doc_id", _png_2x2_interlaced_payload().alias("raw")),
        "raw", "image", "png",
    )
    return decode_media(media, id_col="doc_id").orderBy("id")


@register(
    "multimodal_real_wav_features",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               [(doc_id*7)%65536, (doc_id*11)%65536, (doc_id*13)%65536, (doc_id*17)%65536,
                (doc_id*19)%65536, (doc_id*23)%65536, (doc_id*29)%65536, (doc_id*31)%65536] AS us
        FROM documents WHERE doc_id < 200
    ),
    s AS (
        SELECT doc_id,
               list_transform(us, x -> CASE WHEN x < 32768 THEN x ELSE x - 65536 END) AS ss
        FROM u
    )
    SELECT doc_id AS id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(8 AS INTEGER) AS n_samples,
           CAST(1000 AS BIGINT) AS duration_us,
           CAST(list_aggregate(list_transform(ss, x -> x*x), 'sum') AS BIGINT) AS sum_sq,
           CAST(len(list_filter(range(1, 8), i -> (ss[i+1] >= 0) != (ss[i] >= 0))) AS INTEGER) AS zero_crossings
    FROM s ORDER BY id
    """,
    tags=("multimodal", "audio", "pandas-udf", "decode"),
)
def multimodal_real_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decoding under the driver's hash gate — the WAV twin of
    multimodal_real_ppm_decode. The query synthesizes a valid RIFF/WAVE
    PCM16 mono payload per document (8 samples at 8 kHz, sample words from
    doc_id arithmetic, little-endian bytes built JVM-side via unhex), runs
    it through the pure-numpy chunk-walking decoder
    (operators.multimodal._decode_wav), and the oracle recomputes the exact
    integer features — energy Σs² and zero crossings over the SIGNED int16
    interpretation — from the same arithmetic. A byte-level bug (chunk
    offsets, endianness, two's-complement handling) lands as a hash
    mismatch."""
    import struct as _struct

    from arrow_parquet_logs_spark.operators.multimodal import attach_media, audio_features

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    n, sr = 8, 8000
    header = (
        b"RIFF"
        + _struct.pack("<I", 36 + 2 * n)
        + b"WAVE"
        + b"fmt "
        + _struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        + b"data"
        + _struct.pack("<I", 2 * n)
    )

    def sample_le(mult: int):
        u = (F.col("doc_id") * mult) % 65536
        lo = F.unhex(F.lpad(F.hex(u % 256), 2, "0"))
        hi = F.unhex(F.lpad(F.hex((u / 256).cast("int")), 2, "0"))
        return F.concat(lo, hi)

    payload = F.concat(F.lit(header), *[sample_le(m) for m in (7, 11, 13, 17, 19, 23, 29, 31)])
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "audio", "wav")
    return audio_features(media, id_col="doc_id").orderBy("id")


#: 48 channel multipliers (one per RGB byte of a 4×4 raster) shared by the
#: Spark payload builder and the programmatically-built DuckDB oracle below
_DHASH_MULTS = [
    3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59,
    61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137,
    139, 149, 151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223, 227,
]


def _dhash_oracle() -> str:
    """DuckDB replay of the 9×8 dHash over the synthesized 4×4 rasters: a
    4×4 source resampled to 9×8 yields real comparisons only between
    adjacent source columns (j, j+1) at grid cols 2j+2, each duplicated on
    the two grid rows of source row s — bit positions 16s+2j+2 and
    16s+2j+10. The oracle computes every luma comparison from the same
    (doc_id % 50)·multiplier arithmetic and brute-forces all pairs."""
    lums = []
    for s in range(4):
        for c in range(4):
            i = 3 * (s * 4 + c)
            r_, g_, b_ = _DHASH_MULTS[i], _DHASH_MULTS[i + 1], _DHASH_MULTS[i + 2]
            lums.append(
                f"299*((k*{r_})%256) + 587*((k*{g_})%256) + 114*((k*{b_})%256) AS l{s}_{c}"
            )
    terms = []
    for s in range(4):
        for j in range(3):
            w = f"(CAST(1 AS BIGINT) << {16 * s + 2 * j + 2}) + (CAST(1 AS BIGINT) << {16 * s + 2 * j + 10})"
            terms.append(f"CASE WHEN l{s}_{j} > l{s}_{j + 1} THEN {w} ELSE 0 END")
    return f"""
    WITH base AS (
        SELECT doc_id, doc_id % 50 AS k FROM documents WHERE doc_id < 300
    ),
    lum AS (
        SELECT doc_id, {', '.join(lums)} FROM base
    ),
    h AS (
        SELECT doc_id, {' + '.join(terms)} AS dh FROM lum
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(bit_count(xor(a.dh, b.dh)) AS INT) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.dh, b.dh)) <= 3
    ORDER BY a_id, b_id
    """


@register(
    "multimodal_dhash_dedup",
    oracle=_dhash_oracle(),
    tags=("multimodal", "dedup", "perceptual-hash", "pandas-udf", "decode"),
)
def multimodal_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image deduplication under the hash gate: synthesized 4×4
    PPMs (50 repeating pixel classes via doc_id % 50) run through the REAL
    decode → integer-luma 9×8 dHash (operators.multimodal.dhash_media),
    then near-duplicate pairs form via the 4-chunk pigeonhole hamming join
    (``dhash_pairs``, guaranteed recall at hamming ≤ 3 — never all-pairs).
    The oracle recomputes every luma comparison bit from the same doc_id
    arithmetic and brute-forces the pair set: a wrong resample index, bit
    position, or a chunk-join recall hole lands as a hash mismatch."""
    from arrow_parquet_logs_spark.operators.multimodal import (
        attach_media,
        dhash_media,
        dhash_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    k = F.col("doc_id") % 50

    def byte(mult: int):
        return F.unhex(F.lpad(F.hex((k * mult) % 256), 2, "0"))

    payload = F.concat(F.lit(b"P6\n4 4\n255\n"), *[byte(m) for m in _DHASH_MULTS])
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "image", "ppm")
    sigs = dhash_media(media, id_col="doc_id")
    return dhash_pairs(sigs, id_col="doc_id", max_hamming=3).orderBy("a_id", "b_id")


@register(
    "multimodal_real_wav_stereo",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               [(doc_id*7)%65536, (doc_id*11)%65536, (doc_id*13)%65536, (doc_id*17)%65536,
                (doc_id*19)%65536, (doc_id*23)%65536, (doc_id*29)%65536, (doc_id*31)%65536] AS us
        FROM documents WHERE doc_id < 200
    ),
    s AS (
        SELECT doc_id,
               list_transform(us, x -> CASE WHEN x < 32768 THEN x ELSE x - 65536 END) AS ss
        FROM u
    ),
    m AS (  -- interleaved L/R pairs downmixed with the exact floor mean
        SELECT doc_id,
               [CAST(floor((ss[1] + ss[2]) / 2.0) AS BIGINT),
                CAST(floor((ss[3] + ss[4]) / 2.0) AS BIGINT),
                CAST(floor((ss[5] + ss[6]) / 2.0) AS BIGINT),
                CAST(floor((ss[7] + ss[8]) / 2.0) AS BIGINT)] AS ds
        FROM s
    )
    SELECT doc_id AS id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(4 AS INTEGER) AS n_samples,
           CAST(500 AS BIGINT) AS duration_us,
           CAST(list_aggregate(list_transform(ds, x -> x*x), 'sum') AS BIGINT) AS sum_sq,
           CAST(len(list_filter(range(1, 4), i -> (ds[i+1] >= 0) != (ds[i] >= 0))) AS INTEGER) AS zero_crossings
    FROM m ORDER BY id
    """,
    tags=("multimodal", "audio", "pandas-udf", "decode", "stereo"),
)
def multimodal_real_wav_stereo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STEREO WAV decode under the driver's hash gate: the same synthesized
    PCM16 sample words as the mono query, declared as 2-channel interleaved
    L/R — the decoder must downmix with the exact floor mean (L+R)>>1
    before computing features, and the oracle replays that floor-mean (as
    floor((l+r)/2.0), since SQL integer division truncates toward zero and
    would disagree on negative samples). Wrong interleave order, truncating
    division, or channel-count mishandling breaks the hash."""
    import struct as _struct

    from arrow_parquet_logs_spark.operators.multimodal import attach_media, audio_features

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    n_frames, sr, ch = 4, 8000, 2
    header = (
        b"RIFF"
        + _struct.pack("<I", 36 + 2 * ch * n_frames)
        + b"WAVE"
        + b"fmt "
        + _struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * 2 * ch, 2 * ch, 16)
        + b"data"
        + _struct.pack("<I", 2 * ch * n_frames)
    )

    def sample_le(mult: int):
        u = (F.col("doc_id") * mult) % 65536
        lo = F.unhex(F.lpad(F.hex(u % 256), 2, "0"))
        hi = F.unhex(F.lpad(F.hex((u / 256).cast("int")), 2, "0"))
        return F.concat(lo, hi)

    payload = F.concat(F.lit(header), *[sample_le(m) for m in (7, 11, 13, 17, 19, 23, 29, 31)])
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "audio", "wav")
    return audio_features(media, id_col="doc_id").orderBy("id")


@register(
    "multimodal_real_tiff_decode",
    oracle="""
    WITH px AS (
        SELECT doc_id,
               (doc_id * 109) % 256 AS r0, (doc_id * 113) % 256 AS g0, (doc_id * 127) % 256 AS b0,
               (doc_id * 131) % 256 AS r1, (doc_id * 137) % 256 AS g1, (doc_id * 139) % 256 AS b1,
               (doc_id * 149) % 256 AS r2, (doc_id * 151) % 256 AS g2, (doc_id * 157) % 256 AS b2,
               (doc_id * 163) % 256 AS r3, (doc_id * 167) % 256 AS g3, (doc_id * 173) % 256 AS b3
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id AS id, 'image' AS media_type,
           CAST(152 AS BIGINT) AS byte_len,
           CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS n_frames,
           (  299*(r0+r1+r2+r3) + 587*(g0+g1+g2+g3) + 114*(b0+b1+b2+b3)
           ) / (1000.0 * 255 * 4) AS mean_luma
    FROM px ORDER BY id
    """,
    tags=("multimodal", "pandas-udf", "decode", "tiff"),
)
def multimodal_real_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF decoding under the driver's hash gate: a fully valid
    little-endian baseline TIFF per document — header, 10-entry IFD
    (width/height/bits/compression/photometric/strip table/rows-per-strip),
    out-of-line [8,8,8] BitsPerSample array, one strip — with only the
    12 raster bytes varying by doc_id arithmetic, so the whole skeleton is
    one Python-computed constant and the oracle recomputes dimensions +
    exact Rec.601 luma. An IFD-walk bug (entry stride, inline-vs-offset
    values, strip assembly) lands as a hash mismatch; endianness,
    multi-strip and grayscale variants are pinned byte-level in
    tests/test_operators.py."""
    import struct as _struct

    from arrow_parquet_logs_spark.operators.multimodal import attach_media, decode_media

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    e, n, ifd_off = "<", 10, 8
    bps_off = ifd_off + 2 + 12 * n + 4
    data_off = bps_off + 6  # raster directly after the [8,8,8] array

    def entry(tag, typ, cnt, val):
        return _struct.pack(e + "HHI", tag, typ, cnt) + _struct.pack(e + "I", val)

    def entry_short(tag, val):
        return _struct.pack(e + "HHI", tag, 3, 1) + _struct.pack(e + "H", val).ljust(4, b"\0")

    prefix = (
        _struct.pack(e + "2sHI", b"II", 42, ifd_off)
        + _struct.pack(e + "H", n)
        + entry(256, 4, 1, 2)            # width
        + entry(257, 4, 1, 2)            # height
        + entry(258, 3, 3, bps_off)      # bits per sample -> out-of-line
        + entry_short(259, 1)            # uncompressed
        + entry_short(262, 2)            # RGB
        + entry(273, 4, 1, data_off)     # strip offset
        + entry_short(277, 3)            # samples per pixel
        + entry(278, 4, 1, 2)            # rows per strip
        + entry(279, 4, 1, 12)           # strip byte count
        + entry_short(296, 2)            # resolution unit (inches)
        + _struct.pack(e + "I", 0)       # next IFD
        + _struct.pack(e + "HHH", 8, 8, 8)
    )
    assert len(prefix) == data_off

    def byte(mult: int):
        return F.unhex(F.lpad(F.hex((F.col("doc_id") * mult) % 256), 2, "0"))

    raster = F.concat(*[byte(m) for m in (109, 113, 127, 131, 137, 139,
                                          149, 151, 157, 163, 167, 173)])
    media = attach_media(
        docs.select("doc_id", F.concat(F.lit(prefix), raster).alias("raw")),
        "raw", "image", "tiff",
    )
    return decode_media(media, id_col="doc_id").orderBy("id")


_H64_SQL = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


def _dhash_expr_sql() -> str:
    """The per-doc dHash value of the synthesized 4×4 rasters in SQL
    (see _dhash_oracle for the bit-position derivation)."""
    lums = []
    for s in range(4):
        for c in range(4):
            i = 3 * (s * 4 + c)
            r_, g_, b_ = _DHASH_MULTS[i], _DHASH_MULTS[i + 1], _DHASH_MULTS[i + 2]
            lums.append(
                f"299*((k*{r_})%256) + 587*((k*{g_})%256) + 114*((k*{b_})%256) AS l{s}_{c}"
            )
    terms = []
    for s in range(4):
        for j in range(3):
            w = (
                f"(CAST(1 AS BIGINT) << {16 * s + 2 * j + 2})"
                f" + (CAST(1 AS BIGINT) << {16 * s + 2 * j + 10})"
            )
            terms.append(f"CASE WHEN l{s}_{j} > l{s}_{j + 1} THEN {w} ELSE 0 END")
    return ", ".join(lums) + " || DHASH || " + " + ".join(terms)


@register(
    "pipeline_multimodal_training_set",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, doc_id % 50 AS k FROM documents WHERE doc_id < 300
    ),
    lum AS (
        SELECT doc_id, {_dhash_expr_sql().split(' || DHASH || ')[0]} FROM base
    ),
    h AS (
        SELECT doc_id, {_dhash_expr_sql().split(' || DHASH || ')[1]} AS dh FROM lum
    ),
    kept AS (
        SELECT doc_id, dh FROM (
            SELECT doc_id, dh,
                   row_number() OVER (PARTITION BY dh ORDER BY doc_id) AS rn
            FROM h
        ) WHERE rn = 1
    ),
    luma AS (
        SELECT b.doc_id,
               (  299*((k*53)%256 + (k*67)%256 + (k*79)%256 + (k*97)%256)
                + 587*((k*59)%256 + (k*71)%256 + (k*83)%256 + (k*101)%256)
                + 114*((k*61)%256 + (k*73)%256 + (k*89)%256 + (k*103)%256)
               ) / (1000.0 * 255 * 4) AS mean_luma
        FROM base b
    )
    SELECT kept.doc_id, kept.dh AS dhash, luma.mean_luma,
           CASE WHEN {_H64_SQL.format(x="concat('split:', CAST(kept.doc_id AS VARCHAR))")} % 100 < 80 THEN 'train'
                WHEN {_H64_SQL.format(x="concat('split:', CAST(kept.doc_id AS VARCHAR))")} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM kept JOIN luma ON kept.doc_id = luma.doc_id
    ORDER BY kept.doc_id
    """,
    tags=("multimodal", "pipeline", "dedup", "split", "pandas-udf"),
)
def pipeline_multimodal_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IMAGE training-set pipeline end to end under ONE hash gate — the
    multimodal twin of `pipeline_training_set`: synthesize per-doc rasters
    (2×2 PPM for the luma feature, 4×4 PPM in 50 pixel classes for dedup),
    REAL-decode features (`decode_media` mean luma), perceptually
    deduplicate (`dhash_media` → keep the lowest doc_id per dHash value —
    exact-duplicate collapse, the groupBy form of the pair operator), and
    assign content-stable train/val/test splits. Every stage is the
    already-verified operator; this pins their COMPOSITION (join keys,
    survivor selection, feature carry-through) — the whole pipeline's
    output hashes against a pure-SQL replay."""
    from arrow_parquet_logs_spark.functions.hashing import hash64
    from arrow_parquet_logs_spark.operators.multimodal import (
        attach_media,
        decode_media,
        dhash_media,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    k = F.col("doc_id") % 50

    def byte(mult):
        return F.unhex(F.lpad(F.hex((k * mult) % 256), 2, "0"))

    # dedup raster: the 4×4 class image (same as multimodal_dhash_dedup)
    quad = F.concat(F.lit(b"P6\n4 4\n255\n"), *[byte(m) for m in _DHASH_MULTS])
    media4 = attach_media(docs.select("doc_id", quad.alias("raw")), "raw", "image", "ppm")
    sigs = dhash_media(media4, id_col="doc_id")
    kept = (
        sigs.groupBy("dhash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "dhash")
    )

    # feature raster: the 2×2 luma image (same pixel classes)
    duo = F.concat(
        F.lit(b"P6\n2 2\n255\n"),
        *[byte(m) for m in (53, 59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103)],
    )
    media2 = attach_media(docs.select("doc_id", duo.alias("raw")), "raw", "image", "ppm")
    feats = decode_media(media2, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "mean_luma"
    )

    bucket = (hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100).cast("int")
    return (
        kept.join(feats, "doc_id")
        .select(
            "doc_id", "dhash", "mean_luma",
            F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
        )
        .orderBy("doc_id")
    )


# ---- GIF: real LZW decode under the hash gate ------------------------------

#: 256-entry global color table shared by the Spark payload builder and the
#: oracle: palette[i] = ((i*3)%256, (i*5)%256, (i*7)%256)
_GIF_GCT = bytes(
    v for i in range(256) for v in ((i * 3) % 256, (i * 5) % 256, (i * 7) % 256)
)


def _gif_lzw_2x2_bytes(p0, p1, p2, p3):
    """The 11 LZW data bytes of a 2×2 image (min code size 8) whose code
    stream is CLEAR p0 CLEAR p1 CLEAR p2 CLEAR p3 EOI — every code stays 9
    bits because the dictionary resets before it can grow, so each output
    byte is a fixed arithmetic function of the pixel indices, expressible
    in Catalyst. The decoder still runs its fully general LZW path
    (variable widths, resets, table bookkeeping) on these bytes."""
    vals = [
        F.lit(0),
        (p0 % 128) * 2 + 1,
        F.shiftright(p0, 7),
        (p1 % 32) * 8 + 4,
        F.shiftright(p1, 5),
        (p2 % 8) * 32 + 16,
        F.shiftright(p2, 3),
        (p3 % 2) * 128 + 64,
        F.shiftright(p3, 1),
        F.lit(1),
        F.lit(1),
    ]
    return F.concat(*[F.unhex(F.lpad(F.hex(v), 2, "0")) for v in vals])


def _gif_pixels(mults):
    return [(F.col("doc_id") * m) % 256 for m in mults]


def _gif_luma_sql(mults) -> str:
    """SQL term: Σ over pixels of 299·R + 587·G + 114·B where pixel index
    p = (doc_id·mult) % 256 resolves through the shared palette."""
    terms = []
    for m in mults:
        p = f"((doc_id*{m})%256)"
        terms.append(f"299*(({p}*3)%256) + 587*(({p}*5)%256) + 114*(({p}*7)%256)")
    return " + ".join(terms)


@register(
    "multimodal_real_gif_decode",
    oracle=f"""
    SELECT doc_id AS id, 'image' AS media_type,
           CAST(806 AS BIGINT) AS byte_len,
           CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS n_frames,
           ({_gif_luma_sql((7, 11, 13, 17))}) / (1000.0 * 255 * 4) AS mean_luma
    FROM documents WHERE doc_id < 200 ORDER BY id
    """,
    tags=("multimodal", "pandas-udf", "decode", "gif"),
)
def multimodal_real_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decoding under the driver's hash gate — hand-rolled LZW +
    palette resolution, no codec library (operators.multimodal._decode_gif).
    The query synthesizes a fully valid single-frame GIF89a per document in
    Catalyst expressions: constant header/LSD/256-entry global color table,
    2×2 raster whose LZW data bytes are arithmetic functions of the pixel
    indices (see ``_gif_lzw_2x2_bytes`` — the clear-before-every-pixel
    construction keeps codes at 9 bits), pixel indices doc_id·(7,11,13,17)
    % 256. The oracle resolves the same indices through the same palette
    arithmetic: an LZW bit-order, sub-block walk, or palette-lookup bug
    lands as a hash mismatch. (Dictionary growth, KwKwK, interlace, and
    multi-frame paths are pinned byte-level in tests.)"""
    import struct as _struct

    from arrow_parquet_logs_spark.operators.multimodal import attach_media, decode_media

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    head = (
        b"GIF89a"
        + _struct.pack("<HHBBB", 2, 2, 0xF7, 0, 0)
        + _GIF_GCT
        + b"\x2c" + _struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + b"\x08\x0b"
    )
    payload = F.concat(
        F.lit(head),
        _gif_lzw_2x2_bytes(*_gif_pixels((7, 11, 13, 17))),
        F.lit(b"\x00\x3b"),
    )
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "image", "gif")
    return decode_media(media, id_col="doc_id").orderBy("id")


@register(
    "multimodal_real_gif_animation",
    oracle=f"""
    SELECT doc_id,
           CAST(2 AS INTEGER) AS n_frames,
           CAST((doc_id % 100 + 7) * 10 AS BIGINT) AS duration_ms,
           ({_gif_luma_sql((7, 11, 13, 17, 19, 23, 29, 31))}) / (1000.0 * 255 * 8) AS mean_luma
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
    tags=("multimodal", "pandas-udf", "decode", "gif", "video"),
)
def multimodal_real_gif_animation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animation-container parsing under the hash gate: a 2-frame
    GIF89a per document with per-frame Graphic Control Extension delays
    (frame 1: doc_id % 100 centiseconds — a VARIABLE byte the parser must
    read from the right offset; frame 2: constant 7 cs), decoded by
    ``gif_animation_info`` into the real frame count, total duration in ms
    from the parsed delays, and the exact mean luma across both frames'
    palette-resolved pixels. This replaces the sha-stubbed duration of
    ``multimodal_frame_plan`` with a real container parse — the returned
    ``duration_ms`` feeds ``frame_sample_plan`` unchanged."""
    import struct as _struct

    from arrow_parquet_logs_spark.operators.multimodal import attach_media, gif_animation_info

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    head = b"GIF89a" + _struct.pack("<HHBBB", 2, 2, 0xF7, 0, 0) + _GIF_GCT
    img_desc = b"\x2c" + _struct.pack("<HHHHB", 0, 0, 2, 2, 0) + b"\x08\x0b"
    delay1 = F.unhex(F.lpad(F.hex(F.col("doc_id") % 100), 2, "0"))
    gce1 = F.concat(F.lit(b"\x21\xf9\x04\x00"), delay1, F.lit(b"\x00\x00\x00"))
    gce2 = F.lit(b"\x21\xf9\x04\x00" + _struct.pack("<H", 7) + b"\x00\x00")
    payload = F.concat(
        F.lit(head),
        gce1, F.lit(img_desc),
        _gif_lzw_2x2_bytes(*_gif_pixels((7, 11, 13, 17))), F.lit(b"\x00"),
        gce2, F.lit(img_desc),
        _gif_lzw_2x2_bytes(*_gif_pixels((19, 23, 29, 31))), F.lit(b"\x00"),
        F.lit(b"\x3b"),
    )
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "video", "gif")
    return gif_animation_info(media, id_col="doc_id").orderBy("doc_id")


# ---- JPEG: real baseline Huffman+IDCT decode under the hash gate -----------

#: ITU T.81 Annex K.3 standard luminance Huffman tables
_JPEG_DC_LUM = (
    bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_JPEG_AC_LUM = (
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


def _jpeg_8x8_head() -> bytes:
    """Constant prefix of a valid baseline JPEG: SOI, DQT (all-ones table),
    SOF0 (8×8 grayscale), the two Annex-K luminance DHT segments, SOS. Only
    the first two entropy-coded scan bytes vary per document."""
    import struct as _struct

    head = bytearray(b"\xff\xd8")
    head += b"\xff\xdb" + _struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    head += b"\xff\xc0" + _struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    for tc, (counts, symbols) in ((0, _JPEG_DC_LUM), (1, _JPEG_AC_LUM)):
        head += (
            b"\xff\xc4"
            + _struct.pack(">H", 3 + 16 + len(symbols))
            + bytes([tc << 4]) + counts + symbols
        )
    head += b"\xff\xda" + _struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    return bytes(head)


@register(
    "multimodal_real_jpeg_decode",
    oracle="""
    SELECT doc_id AS id, 'image' AS media_type,
           CAST(315 AS BIGINT) AS byte_len,
           CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS n_frames,
           CAST(144 + doc_id % 16 AS DOUBLE) / 255 AS mean_luma
    FROM documents WHERE doc_id < 200 ORDER BY id
    """,
    tags=("multimodal", "pandas-udf", "decode", "jpeg"),
)
def multimodal_real_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decoding under the driver's hash gate — hand-
    rolled Huffman + dequantization + IDCT, no codec library
    (operators.multimodal._decode_jpeg). Each document gets a fully valid
    8×8 grayscale JPEG: constant DQT/SOF0/DHT (ITU T.81 Annex K luminance
    tables) plus a 3-byte entropy scan encoding a single DC-only block with
    coefficient d = 129 + 8·(doc_id % 16) — DC category 8 (6-bit code
    ``111110``), 8 magnitude bits, EOB, padding; the two variable bytes are arithmetic
    in d. A DC-only block IDCTs to the flat value d/8, so every pixel is
    floor(d/8 + 0.5) + 128 = 144 + doc_id % 16 exactly (d ≡ 1 mod 8 keeps
    the rounding 0.125 away from any boundary), which the oracle restates
    as mean_luma. A Huffman-table, bit-unstuffing, zigzag, dequant, or
    IDCT-normalization bug lands as a hash mismatch. (Multi-block DC
    prediction, AC run-lengths, restart markers, and 4:2:0 chroma are
    pinned byte-level in tests.)"""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, decode_media

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    d = F.col("doc_id") % 16 * 8 + 129
    s0 = F.shiftright(d, 6) + 0xF8
    s1 = (d % 64) * 4 + 2
    payload = F.concat(
        F.lit(_jpeg_8x8_head()),
        F.unhex(F.lpad(F.hex(s0), 2, "0")),
        F.unhex(F.lpad(F.hex(s1), 2, "0")),
        F.lit(b"\xbf\xff\xd9"),
    )
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "image", "jpeg")
    return decode_media(media, id_col="doc_id").orderBy("id")


def _avi_mjpeg_parts(n_frames: int = 3, fps: int = 10) -> list:
    """Constant byte segments of an ``n_frames``-frame Motion-JPEG AVI whose
    only per-document variation is the 2-byte entropy scan of each frame
    (same DC-only arithmetic as `multimodal_real_jpeg_decode`). Returns
    segments [c0, c1, ..., cn] such that
    payload = c0 + v0 + c1 + v1 + ... + v(n-1) + cn, with each v_k the two
    variable scan bytes of frame k. The container is a fully valid RIFF
    tree — avih MainAVIHeader with real frame timing, a vids/MJPG strl,
    movi '00dc' chunks with even-byte padding — per Microsoft's public
    AVI RIFF File Reference."""
    import struct as _struct

    jhead = _jpeg_8x8_head()
    frame_len = len(jhead) + 2 + 3  # head + 2 variable bytes + BF FF D9
    strf = _struct.pack("<IiiHH4sIiiII", 40, 8, 8, 1, 24, b"MJPG", frame_len, 0, 0, 0, 0)
    strf_ck = b"strf" + _struct.pack("<I", len(strf)) + strf
    strh = (
        b"vids" + b"MJPG"
        + _struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, n_frames, frame_len, 0, 0)
        + _struct.pack("<HHHH", 0, 0, 8, 8)
    )
    strh_ck = b"strh" + _struct.pack("<I", len(strh)) + strh
    strl = (
        b"LIST" + _struct.pack("<I", 4 + len(strh_ck) + len(strf_ck)) + b"strl"
        + strh_ck + strf_ck
    )
    avih = _struct.pack(
        "<IIIIIIIIII",
        1_000_000 // fps, frame_len * fps, 0, 0x10, n_frames, 0, 1, frame_len, 8, 8,
    ) + b"\x00" * 16
    avih_ck = b"avih" + _struct.pack("<I", len(avih)) + avih
    hdrl = b"LIST" + _struct.pack("<I", 4 + len(avih_ck) + len(strl)) + b"hdrl" + avih_ck + strl
    frame_ck = b"00dc" + _struct.pack("<I", frame_len)
    pad = b"\x00" if frame_len % 2 else b""
    movi_size = 4 + n_frames * (8 + frame_len + len(pad))
    movi = b"LIST" + _struct.pack("<I", movi_size) + b"movi"
    riff_size = 4 + len(hdrl) + 8 + movi_size
    head0 = b"RIFF" + _struct.pack("<I", riff_size) + b"AVI " + hdrl + movi + frame_ck + jhead
    mid = b"\xbf\xff\xd9" + pad + frame_ck + jhead
    tail = b"\xbf\xff\xd9" + pad
    return [head0] + [mid] * (n_frames - 1) + [tail]


def _avi_payload_expr(parts: list):
    """Spark column assembling the per-document AVI payload from the
    constant segments, splicing in frame k's two entropy-scan bytes
    (DC coefficient d_k = 129 + 8·((doc_id + k) mod 16) → flat pixel
    value 144 + (doc_id + k) mod 16)."""
    pieces = []
    for k, part in enumerate(parts[:-1]):
        d = (F.col("doc_id") + k) % 16 * 8 + 129
        pieces.append(F.lit(part))
        pieces.append(F.unhex(F.lpad(F.hex(F.shiftright(d, 6) + 0xF8), 2, "0")))
        pieces.append(F.unhex(F.lpad(F.hex(d % 64 * 4 + 2), 2, "0")))
    pieces.append(F.lit(parts[-1]))
    return F.concat(*pieces)


@register(
    "multimodal_real_avi_mjpeg",
    oracle="""
    SELECT doc_id AS id, 'video' AS media_type,
           CAST(1196 AS BIGINT) AS byte_len,
           CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS n_frames,
           CAST(432 + doc_id % 16 + (doc_id + 1) % 16 + (doc_id + 2) % 16 AS DOUBLE)
               / 765 AS mean_luma
    FROM documents WHERE doc_id < 200 ORDER BY id
    """,
    tags=("multimodal", "pandas-udf", "decode", "video", "avi"),
)
def multimodal_real_avi_mjpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decoding under the driver's hash gate: each document gets
    a fully valid 3-frame Motion-JPEG AVI (RIFF hdrl/movi tree with true
    frame timing; every '00dc' chunk a complete baseline JPEG), parsed by
    the hand-rolled RIFF walker (operators.multimodal._avi_frames) with
    each frame decoded by the same Huffman+IDCT machinery as
    `multimodal_real_jpeg_decode`. Frame k is flat 144 + (doc_id+k) mod 16,
    so the all-frames mean luma is closed-form — a container-walk, chunk
    padding, or per-frame decode bug lands as a hash mismatch. This is the
    real-decode half of the video tier; `frame_sample_plan` remains the
    planning stage for codec-gated formats."""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, decode_media

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    payload = _avi_payload_expr(_avi_mjpeg_parts())
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "video", "avi")
    return decode_media(media, id_col="doc_id").orderBy("id")


@register(
    "multimodal_real_avi_frame_sample",
    oracle="""
    SELECT doc_id AS id, f.frame_idx,
           CAST(f.frame_idx * 100 AS BIGINT) AS ts_ms,
           CAST(144 + (doc_id + f.frame_idx) % 16 AS DOUBLE) / 255 AS luma
    FROM documents, (VALUES (0), (2)) AS f(frame_idx)
    WHERE doc_id < 200 ORDER BY id, frame_idx
    """,
    tags=("multimodal", "pandas-udf", "video", "avi", "frame-sample"),
)
def multimodal_real_avi_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling: the 3-frame 10-fps MJPEG AVI of
    `multimodal_real_avi_mjpeg`, sampled every 200 ms by
    operators.multimodal.video_frame_features — the tick at 0 ms lands on
    frame 0 and the tick at 200 ms on frame 2 (frame k is on screen during
    [k·100 ms, (k+1)·100 ms)), so the oracle is two closed-form rows per
    document with each sampled frame's exact flat luma. This *executes*
    the sampling that `frame_sample_plan` only plans, against real
    container timing (avih dwMicroSecPerFrame), not metadata stubs."""
    from arrow_parquet_logs_spark.operators.multimodal import (
        attach_media,
        video_frame_features,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    payload = _avi_payload_expr(_avi_mjpeg_parts())
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "video", "avi")
    return (
        video_frame_features(media, every_ms=200, id_col="doc_id")
        .select(
            F.col("doc_id").alias("id"), "frame_idx", "ts_ms", "luma"
        )
        .orderBy("id", "frame_idx")
    )


def _jpeg_prog_8x8_head() -> bytes:
    """Constant prefix of a valid PROGRESSIVE JPEG: SOI, DQT (all-ones),
    SOF2 (8×8 grayscale), the Annex-K DHT pair — scans follow, each with
    its own SOS header."""
    import struct as _struct

    head = bytearray(b"\xff\xd8")
    head += b"\xff\xdb" + _struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    head += b"\xff\xc2" + _struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    for tc, (counts, symbols) in ((0, _JPEG_DC_LUM), (1, _JPEG_AC_LUM)):
        head += (
            b"\xff\xc4"
            + _struct.pack(">H", 3 + 16 + len(symbols))
            + bytes([tc << 4]) + counts + symbols
        )
    return bytes(head)


def _jpeg_sos(ss: int, se: int, ah: int, al: int) -> bytes:
    import struct as _struct

    return b"\xff\xda" + _struct.pack(">HB", 8, 1) + bytes([1, 0x00, ss, se, (ah << 4) | al])


@register(
    "multimodal_real_jpeg_progressive",
    oracle="""
    SELECT doc_id AS id, 'image' AS media_type,
           CAST(336 AS BIGINT) AS byte_len,
           CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS n_frames,
           CAST(144 + doc_id % 16 AS DOUBLE) / 255 AS mean_luma
    FROM documents WHERE doc_id < 200 ORDER BY id
    """,
    tags=("multimodal", "pandas-udf", "decode", "jpeg", "progressive"),
)
def multimodal_real_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive JPEG (SOF2) decoding under the driver's hash gate —
    successive-approximation scan assembly with no codec library
    (operators.multimodal._decode_jpeg_progressive_inner). Each document
    gets a valid three-scan progressive stream for the SAME flat image as
    `multimodal_real_jpeg_decode` (d = 129 + 8·(doc_id % 16), every pixel
    144 + doc_id % 16):

    1. DC first scan at Al=1: category-7 code ``11110`` + 7 magnitude bits
       of d>>1 (d∈[129,249] ⇒ d>>1∈[64,124], always category 7), padded
       with 1s — the two bytes are arithmetic in d;
    2. DC refinement (Ah=1, Al=0): one raw bit = d&1 = 1 (d is odd), byte
       0x80;
    3. AC first scan (Ss=1..Se=63): all-zero AC ⇒ single EOB ``1010``,
       byte 0xAF.

    The decoder must route SOF2 to the progressive path, accumulate
    (d>>1)<<1 from scan 1, OR in the refinement bit, and IDCT the
    assembled coefficients — a scan-dispatch, point-transform, or
    refinement bug lands as a hash mismatch. (EOBRUN spans, AC
    successive approximation, spectral-band splits, and correction-bit
    ordering are pinned byte-level in
    tests/test_decoders_property.py::test_jpeg_progressive_*.)"""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, decode_media

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    d = F.col("doc_id") % 16 * 8 + 129
    v = F.shiftright(d, 1)
    b0 = F.shiftright(v, 4) + 0xF0
    b1 = (v % 16) * 16 + 0x0F
    payload = F.concat(
        F.lit(_jpeg_prog_8x8_head()),
        F.lit(_jpeg_sos(0, 0, 0, 1)),
        F.unhex(F.lpad(F.hex(b0), 2, "0")),
        F.unhex(F.lpad(F.hex(b1), 2, "0")),
        F.lit(_jpeg_sos(0, 0, 1, 0) + b"\x80"),
        F.lit(_jpeg_sos(1, 63, 0, 0) + b"\xaf"),
        F.lit(b"\xff\xd9"),
    )
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "image", "jpeg")
    return decode_media(media, id_col="doc_id").orderBy("id")


#: RIFF/WEBP/VP8L wrapper + the 5-byte VP8L header for a 2×2 image
#: (sig 0x2F, w-1=1 and h-1=1 as 14-bit fields, no alpha hint, version 0 —
#: exactly 40 bits, byte-aligned).
_WEBP_PREFIX = (
    b"RIFF" + (26).to_bytes(4, "little") + b"WEBP"
    + b"VP8L" + (13).to_bytes(4, "little")
    + bytes([0x2F, 0x01, 0x40, 0x00, 0x00])
)

#: constant bits of the 64-bit entropy-image tail: transform/cache/meta
#: flags 0, then five SIMPLE single-symbol prefix codes (header bits
#: 1,0,1 + 8-bit symbol each) for green/red/blue/alpha/distance — blue=1,
#: alpha=255, distance=1 fixed; green at bit 6 and red at bit 17 vary.
#: Single-symbol codes read ZERO bits per pixel, so the four pixels cost
#: nothing and the stream ends after the code headers.
_WEBP_TAIL_CONST = (
    (1 << 3) | (1 << 5)                # green: simple, 1 sym, 8-bit flag
    | (1 << 14) | (1 << 16)            # red header
    | (1 << 25) | (1 << 27) | (1 << 28)   # blue header + symbol 1
    | (1 << 36) | (1 << 38) | (255 << 39)  # alpha header + symbol 255
    | (1 << 47) | (1 << 49) | (1 << 50)    # distance header + symbol 1
)


@register(
    "multimodal_real_webp_decode",
    oracle="""
    SELECT doc_id AS id, 'image' AS media_type,
           CAST(34 AS BIGINT) AS byte_len,
           CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS n_frames,
           CAST(299 * (doc_id % 16 * 16) + 587 * (doc_id % 8 * 8 + 7) + 114
                AS DOUBLE) / 255000 AS mean_luma
    FROM documents WHERE doc_id < 200 ORDER BY id
    """,
    tags=("multimodal", "pandas-udf", "decode", "webp", "vp8l"),
)
def multimodal_real_webp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WebP-lossless (VP8L) decoding under the driver's hash gate —
    hand-rolled LSB-first bitstream, canonical prefix codes, transform
    machinery (operators.multimodal._decode_vp8l), no codec library. Each
    document gets a fully valid 34-byte lossless WebP: RIFF/VP8L wrapper,
    2×2 header, and five SIMPLE single-symbol prefix codes — green
    doc_id%8*8+7 and red doc_id%16*16 are arithmetic in doc_id; blue 1,
    alpha 255. Single-symbol codes consume zero bits per pixel (the spec's
    degenerate-code rule), so all four pixels decode from the code
    headers alone and mean_luma is the exact Rec.601 rational the oracle
    restates. A bit-order, canonical-code, RIFF-walk, or zero-bit-code
    bug lands as a hash mismatch. (LZ77 backrefs, color cache, the
    distance map, meta code groups, and all four transforms are pinned
    byte-level in tests/test_decoders_property.py::test_vp8l_*.)"""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, decode_media

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    g = (F.col("doc_id") % 8 * 8 + 7).cast("long")
    r = (F.col("doc_id") % 16 * 16).cast("long")
    tail = (
        F.lit(_WEBP_TAIL_CONST).cast("long")
        + F.shiftleft(g, 6)
        + F.shiftleft(r, 17)
    )
    tail_bytes = [
        F.unhex(
            F.lpad(F.hex(F.shiftright(tail, 8 * k).bitwiseAND(F.lit(255))), 2, "0")
        )
        for k in range(8)
    ]
    payload = F.concat(F.lit(_WEBP_PREFIX), *tail_bytes, F.lit(b"\x00"))
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "image", "webp")
    return decode_media(media, id_col="doc_id").orderBy("id")


@register(
    "multimodal_real_ulaw_features",
    oracle="""
    WITH b AS (
        SELECT doc_id,
               [(doc_id*7)%256, (doc_id*11)%256, (doc_id*13)%256, (doc_id*17)%256,
                (doc_id*19)%256, (doc_id*23)%256, (doc_id*29)%256, (doc_id*31)%256] AS bs
        FROM documents WHERE doc_id < 200
    ),
    s AS (  -- G.711 mu-law expansion: complement, 3-bit exponent, +0x84 bias
        SELECT doc_id,
               list_transform(bs, x -> CASE
                   WHEN xor(x, 255) >= 128
                   THEN 132 - (((xor(x, 255) % 16) * 8 + 132) * (1 << ((xor(x, 255) // 16) % 8)))
                   ELSE (((xor(x, 255) % 16) * 8 + 132) * (1 << ((xor(x, 255) // 16) % 8))) - 132
               END) AS ss
        FROM b
    )
    SELECT doc_id AS id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(8 AS INTEGER) AS n_samples,
           CAST(1000 AS BIGINT) AS duration_us,
           CAST(list_aggregate(list_transform(ss, x -> x*x), 'sum') AS BIGINT) AS sum_sq,
           CAST(len(list_filter(range(1, 8), i -> (ss[i+1] >= 0) != (ss[i] >= 0))) AS INTEGER) AS zero_crossings
    FROM s ORDER BY id
    """,
    tags=("multimodal", "audio", "pandas-udf", "decode", "g711"),
)
def multimodal_real_ulaw_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL G.711 μ-law decoding under the driver's hash gate: a RIFF/WAVE
    payload with format code 7 (8-bit μ-law companded samples, one byte
    each from doc_id arithmetic) runs through the chunk-walking decoder and
    the exact-integer ITU expansion table (operators.multimodal._ulaw_table
    — complement, 3-bit exponent, 4-bit mantissa, +0x84 bias), and the
    oracle replays the same expansion in SQL bit arithmetic before
    recomputing energy and zero crossings. A companding-table bug at any of
    the 256 byte values the documents hit lands as a hash mismatch."""
    import struct as _struct

    from arrow_parquet_logs_spark.operators.multimodal import attach_media, audio_features

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    n, sr = 8, 8000
    header = (
        b"RIFF" + _struct.pack("<I", 36 + n) + b"WAVE"
        + b"fmt " + _struct.pack("<IHHIIHH", 16, 7, 1, sr, sr, 1, 8)
        + b"data" + _struct.pack("<I", n)
    )

    def byte(mult: int):
        return F.unhex(F.lpad(F.hex((F.col("doc_id") * mult) % 256), 2, "0"))

    payload = F.concat(F.lit(header), *[byte(m) for m in (7, 11, 13, 17, 19, 23, 29, 31)])
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "audio", "wav")
    return audio_features(media, id_col="doc_id").orderBy("id")


@register(
    "multimodal_real_adpcm_features",
    oracle="""
    WITH RECURSIVE init AS (
        SELECT doc_id,
               CASE WHEN (doc_id*37)%65536 >= 32768 THEN (doc_id*37)%65536 - 65536
                    ELSE (doc_id*37)%65536 END AS pred,
               doc_id % 89 AS idx,
               [(doc_id*7)%256, (doc_id*11)%256, (doc_id*13)%256, (doc_id*17)%256] AS d
        FROM documents WHERE doc_id < 200
    ),
    -- replay the IMA ADPCM state machine: k counts decoded nibbles, the
    -- recursive step applies quantizer step/diff/clamp and index walk
    dec AS (
        SELECT doc_id, 0 AS k, pred, idx,
               CAST(pred AS BIGINT)*pred AS sum_sq, 0 AS zc, pred AS prev, d
        FROM init
        UNION ALL
        SELECT doc_id, k+1, new_pred, new_idx,
               sum_sq + CAST(new_pred AS BIGINT)*new_pred,
               zc + CASE WHEN (new_pred >= 0) != (prev >= 0) THEN 1 ELSE 0 END,
               new_pred, d
        FROM (
            SELECT doc_id, k, sum_sq, zc, d, nib, idx,
                   GREATEST(-32768, LEAST(32767,
                       pred + CASE WHEN nib >= 8 THEN -diff ELSE diff END)) AS new_pred,
                   GREATEST(0, LEAST(88,
                       idx + [-1,-1,-1,-1,2,4,6,8][(nib%8)+1])) AS new_idx,
                   pred AS prev
            FROM (
                SELECT *,
                       (step//8) + CASE WHEN nib%8 >= 4 THEN step ELSE 0 END
                                 + CASE WHEN nib%4 >= 2 THEN step//2 ELSE 0 END
                                 + CASE WHEN nib%2 = 1 THEN step//4 ELSE 0 END AS diff
                FROM (
                    SELECT *,
                           CASE WHEN k%2 = 0 THEN d[k//2+1] % 16
                                ELSE d[k//2+1] // 16 END AS nib,
                           [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,
                            41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,
                            190,209,230,253,279,307,337,371,408,449,494,544,598,658,
                            724,796,876,963,1060,1166,1282,1411,1552,1707,1878,2066,
                            2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,
                            6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,
                            16818,18500,20350,22385,24623,27086,29794,32767][idx+1] AS step
                    FROM dec WHERE k < 8
                )
            )
        )
    )
    SELECT doc_id AS id, CAST(8000 AS INTEGER) AS sample_rate,
           CAST(9 AS INTEGER) AS n_samples, CAST(1125 AS BIGINT) AS duration_us,
           sum_sq, CAST(zc AS INTEGER) AS zero_crossings
    FROM dec WHERE k = 8 ORDER BY id
    """,
    tags=("multimodal", "audio", "pandas-udf", "decode", "adpcm"),
)
def multimodal_real_adpcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio decode under the driver's hash gate: IMA
    ADPCM (WAV format tag 0x11), the 4-bit differential codec. Each
    document gets one 8-byte ADPCM block — int16 predictor seeded from
    doc_id (emitted as sample 0), step index doc_id%89, four data bytes =
    eight 4-bit codes — decoded by the real state machine
    (operators.multimodal._decode_ima_adpcm: step table, diff
    reconstruction, int16 clamp, index walk). The oracle replays that
    state machine as a RECURSIVE CTE over the same 89-entry step table, so
    any quantizer/clamp/index bug at any of the 9 samples per doc lands as
    a hash mismatch. 4 bits per sample is the 4× audio compression tier —
    the decode stays per-payload linear and Arrow-batched, the aggregation
    stays Catalyst."""
    import struct as _struct

    from arrow_parquet_logs_spark.operators.multimodal import attach_media, audio_features

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    n_data = 8  # one block: 4-byte header + 4 code bytes → 9 samples
    header = (
        b"RIFF" + _struct.pack("<I", 40 + n_data) + b"WAVE"
        + b"fmt " + _struct.pack("<IHHIIHHHH", 20, 0x11, 1, 8000, 4055, 8, 4, 2, 9)
        + b"data" + _struct.pack("<I", n_data)
    )

    def byte(v):
        return F.unhex(F.lpad(F.hex(v), 2, "0"))

    u = (F.col("doc_id") * 37) % 65536
    block = F.concat(
        byte(u % 256),                       # predictor int16 LE, low byte
        byte((u / 256).cast("int")),         # predictor high byte
        byte(F.col("doc_id") % 89),          # step index
        F.lit(b"\x00"),                      # reserved
        *[byte((F.col("doc_id") * m) % 256) for m in (7, 11, 13, 17)],
    )
    media = attach_media(
        docs.select("doc_id", F.concat(F.lit(header), block).alias("raw")),
        "raw", "audio", "wav",
    )
    return audio_features(media, id_col="doc_id").orderBy("id")


@register(
    "multimodal_real_msadpcm_features",
    oracle="""
    WITH RECURSIVE init AS (
        SELECT doc_id,
               doc_id % 7 AS pi,
               16 + doc_id % 100 AS delta,
               CASE WHEN (doc_id*37)%65536 >= 32768 THEN (doc_id*37)%65536 - 65536
                    ELSE (doc_id*37)%65536 END AS s1,
               CASE WHEN (doc_id*53)%65536 >= 32768 THEN (doc_id*53)%65536 - 65536
                    ELSE (doc_id*53)%65536 END AS s2,
               [(doc_id*7)%256, (doc_id*11)%256] AS d
        FROM documents WHERE doc_id < 200
    ),
    c AS (
        SELECT *,
               [256,512,0,192,240,460,392][pi+1] AS c1,
               [0,-256,0,64,0,-208,-232][pi+1] AS c2
        FROM init
    ),
    -- replay the MS ADPCM state machine: header samples s2,s1 emitted
    -- first, then 4 signed nibbles (HIGH first) through the adaptive
    -- predictor; the prediction division truncates toward zero (C
    -- semantics), which is NOT // on negatives — hence the CASE
    dec AS (
        SELECT doc_id, 0 AS k, s1, s2, delta, c1, c2, d,
               CAST(s2 AS BIGINT)*s2 + CAST(s1 AS BIGINT)*s1 AS sum_sq,
               CASE WHEN (s1 >= 0) != (s2 >= 0) THEN 1 ELSE 0 END AS zc,
               s1 AS prev
        FROM c
        UNION ALL
        SELECT doc_id, k+1, new_s AS s1, s1 AS s2,
               GREATEST(16, (
                   [230,230,230,230,307,409,512,614,768,614,512,409,307,230,230,230][nib+1]
                   * delta) // 256) AS delta,
               c1, c2, d,
               sum_sq + CAST(new_s AS BIGINT)*new_s,
               zc + CASE WHEN (new_s >= 0) != (prev >= 0) THEN 1 ELSE 0 END,
               new_s AS prev
        FROM (
            SELECT *,
                   GREATEST(-32768, LEAST(32767,
                       CASE WHEN num >= 0 THEN num // 256 ELSE -((-num) // 256) END
                       + (CASE WHEN nib >= 8 THEN nib - 16 ELSE nib END) * delta)) AS new_s
            FROM (
                SELECT *,
                       CASE WHEN k%2 = 0 THEN d[k//2+1] // 16 ELSE d[k//2+1] % 16 END AS nib,
                       CAST(s1 AS BIGINT)*c1 + CAST(s2 AS BIGINT)*c2 AS num
                FROM dec WHERE k < 4
            )
        )
    )
    SELECT doc_id AS id, CAST(8000 AS INTEGER) AS sample_rate,
           CAST(6 AS INTEGER) AS n_samples, CAST(750 AS BIGINT) AS duration_us,
           sum_sq, CAST(zc AS INTEGER) AS zero_crossings
    FROM dec WHERE k = 4 ORDER BY id
    """,
    tags=("multimodal", "audio", "pandas-udf", "decode", "adpcm"),
)
def multimodal_real_msadpcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Microsoft ADPCM decode (WAV format tag 0x02) under the
    driver's hash gate — the adaptive-coefficient twin of
    `multimodal_real_adpcm_features`. Each document gets one 9-byte block:
    coefficient-pair index doc_id%7 (exercising all 7 standard predictor
    pairs across the corpus), initial delta, two seeded header samples
    (emitted first, older leading), and two code bytes = four HIGH-first
    signed nibbles through the real state machine
    (operators.multimodal._decode_ms_adpcm: ×256 fixed-point two-tap
    prediction with C-truncating division, int16 clamp, delta adaptation
    floor 16). The oracle replays every step as a RECURSIVE CTE — the
    truncate-vs-floor division distinction on negative predictions is
    exactly the kind of bug the hash gate exists to catch."""
    import struct as _struct

    from arrow_parquet_logs_spark.operators.multimodal import attach_media, audio_features

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    n_data = 9  # one block: 7-byte header + 2 code bytes → 6 samples
    header = (
        b"RIFF" + _struct.pack("<I", 40 + n_data) + b"WAVE"
        + b"fmt " + _struct.pack("<IHHIIHHHH", 20, 0x02, 1, 8000, 4055, 9, 4, 2, 6)
        + b"data" + _struct.pack("<I", n_data)
    )

    def byte(v):
        return F.unhex(F.lpad(F.hex(v), 2, "0"))

    def int16le(u):
        return F.concat(byte(u % 256), byte((u / 256).cast("int")))

    u1 = (F.col("doc_id") * 37) % 65536
    u2 = (F.col("doc_id") * 53) % 65536
    delta = F.lit(16) + F.col("doc_id") % 100
    block = F.concat(
        byte(F.col("doc_id") % 7),            # coefficient-pair index
        int16le(delta),                        # initial delta (int16 LE)
        int16le(u1),                           # sample1 (newer)
        int16le(u2),                           # sample2 (older)
        byte((F.col("doc_id") * 7) % 256),     # code bytes
        byte((F.col("doc_id") * 11) % 256),
    )
    media = attach_media(
        docs.select("doc_id", F.concat(F.lit(header), block).alias("raw")),
        "raw", "audio", "wav",
    )
    return audio_features(media, id_col="doc_id").orderBy("id")


@register(
    "multimodal_real_aiff_features",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               [(doc_id*37)%65536, (doc_id*41)%65536, (doc_id*43)%65536, (doc_id*47)%65536,
                (doc_id*53)%65536, (doc_id*59)%65536, (doc_id*61)%65536, (doc_id*67)%65536] AS us
        FROM documents WHERE doc_id < 200
    ),
    s AS (
        SELECT doc_id,
               list_transform(us, x -> CASE WHEN x < 32768 THEN x ELSE x - 65536 END) AS ss
        FROM u
    )
    SELECT doc_id AS id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(8 AS INTEGER) AS n_samples,
           CAST(1000 AS BIGINT) AS duration_us,
           CAST(list_aggregate(list_transform(ss, x -> x*x), 'sum') AS BIGINT) AS sum_sq,
           CAST(len(list_filter(range(1, 8), i -> (ss[i+1] >= 0) != (ss[i] >= 0))) AS INTEGER) AS zero_crossings
    FROM s ORDER BY id
    """,
    tags=("multimodal", "audio", "pandas-udf", "decode", "aiff"),
)
def multimodal_real_aiff_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL AIFF decoding under the driver's hash gate — the big-endian
    container twin of `multimodal_real_wav_features`. Each document gets a
    valid FORM/AIFF file: COMM chunk whose sample rate is the 80-bit IEEE
    extended-precision value for 8000 Hz (decoded by hand in
    operators.multimodal._decode_aiff — 15-bit exponent, explicit-one
    64-bit mantissa), SSND chunk with 8 BIG-endian int16 samples from
    doc_id arithmetic. The oracle recomputes the signed-sample features;
    an endianness, chunk-offset, or extended-float bug lands as a hash
    mismatch."""
    import struct as _struct

    from arrow_parquet_logs_spark.operators.multimodal import attach_media, audio_features

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    rate = 8000
    e = rate.bit_length() - 1
    ext80 = _struct.pack(">HQ", 16383 + e, rate << (63 - e))
    comm = _struct.pack(">HIH", 1, 8, 16) + ext80
    head = (
        b"FORM" + _struct.pack(">I", 4 + (8 + len(comm)) + (8 + 24)) + b"AIFF"
        + b"COMM" + _struct.pack(">I", len(comm)) + comm
        + b"SSND" + _struct.pack(">I", 24) + _struct.pack(">II", 0, 0)
    )

    def sample_be(mult: int):
        u = (F.col("doc_id") * mult) % 65536
        hi = F.unhex(F.lpad(F.hex((u / 256).cast("int")), 2, "0"))
        lo = F.unhex(F.lpad(F.hex(u % 256), 2, "0"))
        return F.concat(hi, lo)

    payload = F.concat(F.lit(head), *[sample_be(m) for m in (37, 41, 43, 47, 53, 59, 61, 67)])
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "audio", "aiff")
    return audio_features(media, id_col="doc_id").orderBy("id")


@register(
    "multimodal_real_jpeg_resize",
    oracle="""
    SELECT doc_id, CAST(1 AS INTEGER) AS width, CAST(1 AS INTEGER) AS height,
           hex(encode('P6' || chr(10) || '1 1' || chr(10) || '255' || chr(10)))
           || repeat(lpad(hex(144 + doc_id % 16), 2, '0'), 3) AS resized_hex
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
    tags=("multimodal", "pandas-udf", "decode", "resize", "jpeg"),
)
def multimodal_real_jpeg_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG → Huffman/IDCT decode → resize → PPM re-encode under the
    hash gate: the same DC-only 8×8 grayscale JPEGs as
    `multimodal_real_jpeg_decode` (flat value 144 + doc_id % 16), shrunk to
    1×1 by the nearest-neighbor resize, so the whole entropy-decode chain
    feeds the resize path and the oracle rebuilds the output file
    byte-for-byte (gray replicates to three equal channels)."""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, resize_media

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    d = F.col("doc_id") % 16 * 8 + 129
    payload = F.concat(
        F.lit(_jpeg_8x8_head()),
        F.unhex(F.lpad(F.hex(F.shiftright(d, 6) + 0xF8), 2, "0")),
        F.unhex(F.lpad(F.hex((d % 64) * 4 + 2), 2, "0")),
        F.lit(b"\xbf\xff\xd9"),
    )
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "image", "jpeg")
    out = resize_media(media, 1, 1, id_col="doc_id")
    return out.select(
        "doc_id", "width", "height", F.hex("resized_payload").alias("resized_hex")
    ).orderBy("doc_id")


@register(
    "multimodal_real_tiff_packbits",
    oracle="""
    WITH px AS (
        SELECT doc_id,
               (doc_id * 101) % 256 AS r0, (doc_id * 103) % 256 AS g0, (doc_id * 107) % 256 AS b0,
               (doc_id * 109) % 256 AS r1, (doc_id * 113) % 256 AS g1, (doc_id * 127) % 256 AS b1,
               (doc_id * 131) % 256 AS r2, (doc_id * 137) % 256 AS g2, (doc_id * 139) % 256 AS b2,
               (doc_id * 149) % 256 AS r3, (doc_id * 151) % 256 AS g3, (doc_id * 157) % 256 AS b3
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id AS id, 'image' AS media_type,
           CAST(153 AS BIGINT) AS byte_len,
           CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS n_frames,
           (  299*(r0+r1+r2+r3) + 587*(g0+g1+g2+g3) + 114*(b0+b1+b2+b3)
           ) / (1000.0 * 255 * 4) AS mean_luma
    FROM px ORDER BY id
    """,
    tags=("multimodal", "pandas-udf", "decode", "tiff", "packbits"),
)
def multimodal_real_tiff_packbits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-TIFF decoding under the driver's hash gate: the same
    IFD skeleton as `multimodal_real_tiff_decode` but with compression tag
    32773 (PackBits) and the strip stored as one 13-byte literal packet
    (control byte 0x0B + the 12 raster bytes) — so the per-strip RLE
    decompression path runs for real on every row. Repeat packets, run
    splits and the 0x80 no-op are pinned by the reference-encoder property
    tests; LZW strips (MSB-first early-change dictionary) are pinned there
    too."""
    import struct as _struct

    from arrow_parquet_logs_spark.operators.multimodal import attach_media, decode_media

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    e, n, ifd_off = "<", 10, 8
    bps_off = ifd_off + 2 + 12 * n + 4
    data_off = bps_off + 6

    def entry(tag, typ, cnt, val):
        return _struct.pack(e + "HHI", tag, typ, cnt) + _struct.pack(e + "I", val)

    def entry_short(tag, val):
        return _struct.pack(e + "HHI", tag, 3, 1) + _struct.pack(e + "H", val).ljust(4, b"\0")

    prefix = (
        _struct.pack(e + "2sHI", b"II", 42, ifd_off)
        + _struct.pack(e + "H", n)
        + entry(256, 4, 1, 2)
        + entry(257, 4, 1, 2)
        + entry(258, 3, 3, bps_off)
        + entry_short(259, 32773)        # PackBits
        + entry_short(262, 2)
        + entry(273, 4, 1, data_off)
        + entry_short(277, 3)
        + entry(278, 4, 1, 2)
        + entry(279, 4, 1, 13)           # 1 control byte + 12 literals
        + entry_short(296, 2)
        + _struct.pack(e + "I", 0)
        + _struct.pack(e + "HHH", 8, 8, 8)
        + b"\x0b"                        # PackBits literal run of 12
    )

    def byte(mult: int):
        return F.unhex(F.lpad(F.hex((F.col("doc_id") * mult) % 256), 2, "0"))

    mults = (101, 103, 107, 109, 113, 127, 131, 137, 139, 149, 151, 157)
    payload = F.concat(F.lit(prefix), *[byte(m) for m in mults])
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "image", "tiff")
    return decode_media(media, id_col="doc_id").orderBy("id")


@register(
    "multimodal_real_flac_features",
    oracle="""
    WITH u AS (
        SELECT doc_id, (doc_id * 7) % 65536 AS uv
        FROM documents WHERE doc_id < 200
    ),
    s AS (
        SELECT doc_id, CASE WHEN uv < 32768 THEN uv ELSE uv - 65536 END AS sv
        FROM u
    )
    SELECT doc_id AS id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(192 AS INTEGER) AS n_samples,
           CAST(24000 AS BIGINT) AS duration_us,
           CAST(192 * sv * sv AS BIGINT) AS sum_sq,
           CAST(0 AS INTEGER) AS zero_crossings
    FROM s ORDER BY id
    """,
    tags=("multimodal", "audio", "pandas-udf", "decode", "flac"),
)
def multimodal_real_flac_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC decoding under the driver's hash gate — hand-rolled
    lossless decode, no codec library (operators.multimodal._decode_flac).
    Each document gets a fully valid FLAC stream: STREAMINFO (8 kHz, mono,
    16-bit, 192 samples), one fixed-blocksize frame whose CRC-8-protected
    header is constant and whose CONSTANT subframe carries the document's
    16-bit sample value — with the frame's CRC-16 computed SYMBOLICALLY in
    Catalyst (two chained lookups through the broadcast 256-entry
    poly-0x8005 table over the two variable sample bytes), so every
    synthesized file passes the decoder's integrity checks. The oracle
    recomputes the exact signed-sample features. Rice-coded FIXED/LPC
    subframes, partitions/escapes, wasted bits, and all four stereo
    decorrelations are pinned by the reference-encoder property tests."""
    from arrow_parquet_logs_spark.operators.multimodal import (
        _flac_crc8,
        _flac_crc16,
        _flac_crc_tables,
        attach_media,
        audio_features,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)

    # constant stream prefix: magic + STREAMINFO + frame header (CRC-8
    # protected, content-independent) + CONSTANT subframe header byte
    bits, acc, n = bytearray(), 0, 0

    def w(v: int, nb: int) -> None:
        nonlocal acc, n
        acc = (acc << nb) | (v & ((1 << nb) - 1))
        n += nb
        while n >= 8:
            bits.append((acc >> (n - 8)) & 0xFF)
            n -= 8
            acc &= (1 << n) - 1

    w(192, 16); w(192, 16); w(0, 24); w(0, 24)         # block/frame sizes
    w(8000, 20); w(0, 3); w(15, 5); w(192, 36)         # rate/ch/bps/total
    sib = bytes(bits) + b"\x00" * 16                   # md5 zero = unverified
    hdr5 = bytes([0xFF, 0xF8, 0x14, 0x08, 0x00])       # sync|bs=192|8kHz|mono|16b|frame 0
    prefix7 = hdr5 + bytes([_flac_crc8(hdr5)]) + b"\x00"
    head = b"fLaC" + bytes([0x80]) + len(sib).to_bytes(3, "big") + sib + prefix7
    c0 = _flac_crc16(prefix7)
    _, t16 = _flac_crc_tables()
    t_arr = F.array(*[F.lit(x) for x in t16])

    def byte(v):
        return F.unhex(F.lpad(F.hex(v), 2, "0"))

    u = (F.col("doc_id") * 7) % 65536
    b_hi, b_lo = F.shiftright(u, 8), u.bitwiseAND(F.lit(255))
    c1 = F.lit((c0 << 8) & 0xFFFF).bitwiseXOR(
        F.element_at(t_arr, (F.lit(c0 >> 8).bitwiseXOR(b_hi) + 1).cast("int"))
    )
    c2 = F.shiftleft(c1, 8).bitwiseAND(F.lit(65535)).bitwiseXOR(
        F.element_at(t_arr, (F.shiftright(c1, 8).bitwiseXOR(b_lo) + 1).cast("int"))
    )
    payload = F.concat(
        F.lit(head), byte(b_hi), byte(b_lo),
        byte(F.shiftright(c2, 8)), byte(c2.bitwiseAND(F.lit(255))),
    )
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "audio", "flac")
    return audio_features(media, id_col="doc_id").orderBy("id")


@register(
    "multimodal_real_tga_decode",
    oracle="""
    WITH px AS (
        SELECT doc_id,
               -- run pixel (bottom row, stored BGR): B=7d G=11d R=13d
               (doc_id * 7) % 256 AS rb, (doc_id * 11) % 256 AS rg, (doc_id * 13) % 256 AS rr,
               -- raw pixels (top row): BGR triples
               (doc_id * 17) % 256 AS p1b, (doc_id * 19) % 256 AS p1g, (doc_id * 23) % 256 AS p1r,
               (doc_id * 29) % 256 AS p2b, (doc_id * 31) % 256 AS p2g, (doc_id * 37) % 256 AS p2r
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id AS id, 'image' AS media_type,
           CAST(29 AS BIGINT) AS byte_len,
           CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS n_frames,
           (  299*(p1r + p2r + rr + rr) + 587*(p1g + p2g + rg + rg)
            + 114*(p1b + p2b + rb + rb)
           ) / (1000.0 * 255 * 4) AS mean_luma
    FROM px ORDER BY id
    """,
    tags=("multimodal", "pandas-udf", "decode", "tga", "rle"),
)
def multimodal_real_tga_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Truevision TGA decoding under the hash gate — the RLE
    (type-10) form, so the packet machinery is exercised, not just a
    header parse: per document a valid 2×2 24-bpp TGA is synthesized
    JVM-side (18-byte header; one RUN packet covering the bottom row —
    TGA stores bottom-up by default, which the decoder must flip — and
    one RAW packet for the top row; pixels BGR), decoded by the
    pure-numpy ``_decode_tga``, and the oracle recomputes dimensions and
    the exact Rec.601 mean luma from the same doc_id arithmetic. A wrong
    channel order, an unflipped raster, or an off-by-one in RLE packet
    accounting is a hash mismatch."""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, decode_media

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)

    def byte(mult: int):
        return F.unhex(F.lpad(F.hex((F.col("doc_id") * mult) % 256), 2, "0"))

    header = F.lit(bytes([0, 0, 10]) + b"\x00" * 5
                   + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
                   + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
                   + bytes([24, 0]))
    run_packet = F.concat(F.lit(b"\x81"), byte(7), byte(11), byte(13))
    raw_packet = F.concat(
        F.lit(b"\x01"),
        byte(17), byte(19), byte(23),
        byte(29), byte(31), byte(37),
    )
    payload = F.concat(header, run_packet, raw_packet)
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "image", "tga")
    return decode_media(media, id_col="doc_id").orderBy("id")


def _mp4_parts() -> list:
    """Constant byte segments of a valid single-track ISO-BMFF (MP4) file
    whose only per-document variation is the FIRST byte of each of its
    three 4-byte samples: payload = c0 + v0 + c1 + v1 + c2 + v2 + c3.
    The container is built strictly from the public ISO/IEC 14496-12
    layout — ftyp(isom), moov(mvhd ts=1000 / trak(tkhd 8x8 16.16 dims,
    mdia(mdhd dur=300, hdlr vide, minf(vmhd, dinf/dref,
    stbl(stsd 'mp4v', stts 3x100, stsc 1 run, stsz uniform 4,
    stco -> mdat payload))))) then mdat. The stco offset is resolved by
    building moov twice (the offset field is fixed-width, so lengths
    don't change)."""
    import struct as _struct

    def box(tag: bytes, body: bytes) -> bytes:
        return _struct.pack(">I", 8 + len(body)) + tag + body

    def full(tag: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
        return box(tag, bytes([version]) + flags.to_bytes(3, "big") + body)

    ftyp = box(b"ftyp", b"isom" + b"\x00" * 4 + b"isom")
    matrix = _struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)

    def moov_bytes(mdat_payload_off: int) -> bytes:
        vse = box(
            b"mp4v",
            b"\x00" * 6 + _struct.pack(">H", 1)          # reserved + dref idx
            + b"\x00" * 16                                # predefined/reserved
            + _struct.pack(">HH", 8, 8)                   # width, height
            + _struct.pack(">II", 0x00480000, 0x00480000) # 72 dpi
            + b"\x00" * 4 + _struct.pack(">H", 1)         # reserved + frame_count
            + b"\x00" * 32 + _struct.pack(">Hh", 24, -1), # compressor + depth
        )
        stbl = box(
            b"stbl",
            full(b"stsd", _struct.pack(">I", 1) + vse)
            + full(b"stts", _struct.pack(">III", 1, 3, 100))
            + full(b"stsc", _struct.pack(">IIII", 1, 1, 3, 1))
            + full(b"stsz", _struct.pack(">II", 4, 3))
            + full(b"stco", _struct.pack(">II", 1, mdat_payload_off)),
        )
        minf = box(
            b"minf",
            full(b"vmhd", _struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
            + box(b"dinf", full(b"dref", _struct.pack(">I", 1) + full(b"url ", b"", flags=1)))
            + stbl,
        )
        mdia = box(
            b"mdia",
            full(b"mdhd", _struct.pack(">IIIIHH", 0, 0, 1000, 300, 0x55C4, 0))
            + full(b"hdlr", _struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"v\x00")
            + minf,
        )
        tkhd = full(
            b"tkhd",
            _struct.pack(">IIIII", 0, 0, 1, 0, 300) + b"\x00" * 8
            + _struct.pack(">HHHH", 0, 0, 0, 0) + matrix
            + _struct.pack(">II", 8 << 16, 8 << 16),
            flags=7,
        )
        mvhd = full(
            b"mvhd",
            _struct.pack(">IIIII", 0, 0, 1000, 300, 0x00010000)
            + _struct.pack(">H", 0x0100) + b"\x00" * 10 + matrix
            + b"\x00" * 24 + _struct.pack(">I", 2),
        )
        return box(b"moov", mvhd + box(b"trak", tkhd + mdia))

    probe = moov_bytes(0)
    moov = moov_bytes(len(ftyp) + len(probe) + 8)  # mdat payload starts past its header
    assert len(moov) == len(probe)
    head = ftyp + moov + _struct.pack(">I", 8 + 12) + b"mdat"
    return [head, bytes([0, 0, 0]), bytes([1, 0, 0]), bytes([2, 0, 0])]


@register(
    "multimodal_real_mp4_index",
    oracle="""
    SELECT doc_id AS id, CAST(1 AS INTEGER) AS track_id, 'vide' AS handler,
           'mp4v' AS codec, CAST(3 AS INTEGER) AS n_samples,
           CAST(300 AS BIGINT) AS duration_ms,
           CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           CAST(12 AS BIGINT) AS sample_bytes,
           CAST(3 * doc_id + 3 AS BIGINT) AS sample_byte_sum,
           'isom' AS brand
    FROM documents WHERE doc_id < 200 ORDER BY id
    """,
    tags=("multimodal", "pandas-udf", "video", "mp4", "container-index"),
)
def multimodal_real_mp4_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4/ISO-BMFF container indexing under the driver's hash gate:
    each document gets a fully valid single-track MP4 (ftyp/moov/mdat with
    complete stts/stsc/stsz/stco sample tables) whose three samples' first
    bytes are doc_id, doc_id+1, doc_id+2. mp4_track_index
    (operators/multimodal.py) walks the box tree and RESOLVES the sample
    tables to exact file offsets, reading each sample's first payload byte
    — so sample_byte_sum = 3*doc_id + 3 proves the stsc run expansion and
    stco+stsz offset arithmetic land on the right bytes, and duration/dims
    prove mdhd/tkhd parsing (16.16 fixed-point dims, media-timescale ms
    conversion). This is the indexing stage a video corpus runs at 100 TB:
    pure container math, Arrow-batched, no codec libraries — decode of the
    codec payloads themselves stays behind the honesty gate."""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, mp4_track_index

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    parts = _mp4_parts()

    def byte(k: int):
        return F.unhex(F.lpad(F.hex((F.col("doc_id") + k) % 256), 2, "0"))

    payload = F.concat(
        F.lit(parts[0]), byte(0), F.lit(parts[1]), byte(1), F.lit(parts[2]),
        byte(2), F.lit(parts[3]),
    )
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "video", "mp4")
    return (
        mp4_track_index(media, id_col="doc_id")
        .withColumnRenamed("doc_id", "id")
        .orderBy("id")
    )


@register(
    "multimodal_real_mp3_index",
    oracle="""
    SELECT doc_id AS id, 'MPEG1' AS version, CAST(3 AS INTEGER) AS layer,
           CAST(3 + doc_id % 5 AS INTEGER) AS n_frames,
           CAST(48000 AS INTEGER) AS sample_rate,
           CAST(24 * (3 + doc_id % 5) AS BIGINT) AS duration_ms,
           CAST(64 AS INTEGER) AS bitrate_kbps, FALSE AS vbr,
           'mono' AS channel_mode, CAST(32 AS INTEGER) AS id3v2_bytes,
           CAST(128 AS INTEGER) AS id3v1_bytes
    FROM documents WHERE doc_id < 200 ORDER BY id
    """,
    tags=("multimodal", "pandas-udf", "audio", "mp3", "container-index"),
)
def multimodal_real_mp3_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MPEG-audio stream indexing under the driver's hash gate: each
    document gets a valid MP3 stream — an ID3v2 tag (syncsafe size), then
    3 + doc_id%5 frames of MPEG1 Layer III at 64 kbps / 48 kHz mono
    (192-byte frames, header fields per the public ISO 11172-3 layout),
    then an ID3v1 trailer. mp3_stream_index
    (operators/multimodal.py:_mp3_frame_index) must skip both tags, walk
    the frame chain by COMPUTED frame lengths (144·br/sr + padding — a
    wrong table or missed padding bit derails the sync and errors), and
    reconstruct the frame count and sample-exact duration
    (1152 samples/frame → exactly 24 ms at 48 kHz). The first indexing
    pass an audio corpus runs at 100 TB — frame-header math only, no
    synthesis, which stays codec-gated."""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, mp3_stream_index

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    frame = bytes([0xFF, 0xFB, 0x54, 0xC0]) + b"\x00" * 188  # MPEG1 L3 64k/48k mono
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 22]) + b"\x00" * 22  # 10+22
    id3v1 = b"TAG" + b"\x00" * 125
    n_frames = F.lit(3) + F.col("doc_id") % 5
    payload = F.concat(
        F.lit(id3v2),
        F.lit(frame * 8).substr(F.lit(1), n_frames * len(frame)),
        F.lit(id3v1),
    )
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "audio", "mp3")
    return (
        mp3_stream_index(media, id_col="doc_id")
        .withColumnRenamed("doc_id", "id")
        .orderBy("id")
    )


def _exif_parts():
    """Constant byte segments of a big-endian EXIF APP1 block (TIFF 6.0
    layout built field-by-field: IFD0 with Make/Model/Orientation/
    DateTime/ExifIFD-pointer, sub-IFD with ISO and pixel dims, string
    values in the trailing data area). The per-document variables are the
    orientation low byte and the 2-byte ISO: payload-prefix = c0 +
    orient(1B) + c1 + iso(2B) + c2. Returns (parts, app1_prefix)."""
    import struct as _struct

    make, model, dt = b"SparkCam\x00", b"GraftShooter\x00", b"2026:01:02 03:04:05\x00"
    sub_off, data_off = 74, 116

    def entry(tag, typ, cnt, val4):
        return _struct.pack(">HHI", tag, typ, cnt) + val4

    ifd0 = _struct.pack(">H", 5)
    ifd0 += entry(0x010F, 2, len(make), _struct.pack(">I", data_off))
    ifd0 += entry(0x0110, 2, len(model), _struct.pack(">I", data_off + len(make)))
    ifd0 += entry(0x0112, 3, 1, b"\x00\x00\x00\x00")  # orientation: byte 1 varies
    ifd0 += entry(0x0132, 2, len(dt), _struct.pack(">I", data_off + len(make) + len(model)))
    ifd0 += entry(0x8769, 4, 1, _struct.pack(">I", sub_off))
    ifd0 += _struct.pack(">I", 0)  # next-IFD: none
    sub = _struct.pack(">H", 3)
    sub += entry(0x8827, 3, 1, b"\x00\x00\x00\x00")  # ISO: bytes 0-1 vary
    sub += entry(0xA002, 4, 1, _struct.pack(">I", 8))
    sub += entry(0xA003, 4, 1, _struct.pack(">I", 8))
    sub += _struct.pack(">I", 0)
    tiff = b"MM" + _struct.pack(">HI", 42, 8) + ifd0 + sub + make + model + dt
    assert len(ifd0) == sub_off - 8 and 8 + len(ifd0) + len(sub) == data_off
    # variable positions (TIFF-relative): orientation lo byte at 43,
    # ISO 2 bytes at 84-85
    assert tiff[43] == 0 and tiff[84:86] == b"\x00\x00"
    app1 = b"\xff\xe1" + _struct.pack(">H", 2 + 6 + len(tiff)) + b"Exif\x00\x00"
    return [app1 + tiff[:43], tiff[44:84], tiff[86:]]


@register(
    "multimodal_real_jpeg_exif",
    oracle="""
    SELECT doc_id AS id, 'MM' AS byte_order, 'SparkCam' AS make,
           'GraftShooter' AS model,
           CAST(1 + doc_id % 8 AS INTEGER) AS orientation,
           '2026:01:02 03:04:05' AS datetime,
           CAST(8 AS BIGINT) AS pixel_x, CAST(8 AS BIGINT) AS pixel_y,
           CAST(100 + (doc_id % 4) * 100 AS INTEGER) AS iso
    FROM documents WHERE doc_id < 200 ORDER BY id
    """,
    tags=("multimodal", "pandas-udf", "image", "exif", "container-index"),
)
def multimodal_real_jpeg_exif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL EXIF extraction under the driver's hash gate: each document's
    payload is a valid JPEG (the 8x8 baseline fixture of
    `multimodal_real_jpeg_decode`) carrying a hand-built big-endian EXIF
    APP1 — IFD0 string values in the offset-addressed data area, an
    inline SHORT orientation (1 + doc_id%8), a 0x8769 sub-IFD with
    inline ISO (100 + 100·(doc_id%4)) and LONG pixel dims.
    jpeg_exif_index (operators/multimodal.py:_jpeg_exif) must walk the
    marker stream, honor the TIFF byte-order mark, distinguish
    inline-vs-offset values by size·count, and chase the sub-IFD pointer
    — each a classic EXIF parser bug surfaced as a hash mismatch. The
    third container indexer (MP4, MPEG-audio, EXIF): corpus metadata
    with zero pixel decode."""
    from arrow_parquet_logs_spark.operators.multimodal import attach_media, jpeg_exif_index

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    p = _exif_parts()
    orient = F.unhex(F.lpad(F.hex(F.lit(1) + F.col("doc_id") % 8), 2, "0"))
    iso = F.unhex(F.lpad(F.hex(F.lit(100) + F.col("doc_id") % 4 * 100), 4, "0"))
    d = F.col("doc_id") % 16 * 8 + 129
    payload = F.concat(
        F.lit(b"\xff\xd8"), F.lit(p[0]), orient, F.lit(p[1]), iso, F.lit(p[2]),
        F.lit(_jpeg_8x8_head()[2:]),
        F.unhex(F.lpad(F.hex(F.shiftright(d, 6) + 0xF8), 2, "0")),
        F.unhex(F.lpad(F.hex(d % 64 * 4 + 2), 2, "0")),
        F.lit(b"\xbf\xff\xd9"),
    )
    media = attach_media(docs.select("doc_id", payload.alias("raw")), "raw", "image", "jpeg")
    return (
        jpeg_exif_index(media, id_col="doc_id")
        .withColumnRenamed("doc_id", "id")
        .orderBy("id")
    )
