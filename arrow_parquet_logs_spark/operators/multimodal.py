"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY.md §2.11): media travels as a ``binary`` payload column inside
a typed struct (schema.MEDIA_STRUCT). Catalyst prunes/pushes down on the
*metadata* fields without ever touching payload bytes; the payload only
crosses into Python — Arrow-batched, via ``mapInPandas`` — in the explicitly
media-processing operators.

The decode step itself is STUBBED: image/audio codecs aren't in this
environment. ``decode_media`` raises ``NotImplementedError`` unless
``allow_fake=True``, in which case it derives small deterministic
pseudo-features from the payload's sha256 — making every piece of the Spark
plumbing (struct schema, Arrow batch shapes, UDF signatures, partition
behavior) real and testable while the codec is a drop-in later.

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


def decode_media(df: DataFrame, id_col: str = "id", allow_fake: bool = False) -> DataFrame:
    """Decode/feature-extract payloads via Arrow-batched ``mapInPandas``.

    Real codecs are unavailable here → ``NotImplementedError`` unless
    ``allow_fake=True`` (deterministic sha-derived pseudo-decode). The Spark
    side — batch iteration, schema contract, payload pruning — is the real
    production shape either way.
    """
    if not _CODECS_AVAILABLE and not allow_fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) not available in this environment; "
            "pass allow_fake=True for the deterministic stub decode"
        )

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            # NULL payloads (schema allows them) hash as empty rather than
            # exploding the whole Arrow batch with bytes(None)
            digests = [hashlib.sha256(bytes(b) if b is not None else b"").digest() for b in payloads]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    # deterministic pseudo-decode from digest bytes
                    "width": [16 + d[0] % 64 for d in digests],
                    "height": [16 + d[1] % 64 for d in digests],
                    "n_frames": [1 for _ in digests],
                    "mean_luma": [d[2] / 255.0 for d in digests],
                }
            )

    flat = df.select(
        F.col(id_col).alias(id_col),
        F.col("media.payload").alias("payload"),
        F.col("media.media_type").alias("media_type"),
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

    Codecs are unavailable here, so the pixel work is STUBBED behind
    ``allow_fake=True``: the fake 'resized' payload is the first
    ``target_w·target_h//64`` bytes of sha256(payload) cycled — deterministic
    in content only (re-ingestion/partitioning invariant), with the output
    contract (binary column + its digest, bounded byte size) identical to a
    real resize. ``NotImplementedError`` otherwise, same gate as
    ``decode_media``. The Spark shape is production-real: payload bytes
    cross to Python once, Arrow-batched, and the output payload is a fresh
    bounded-size binary column (never wider than the input batch)."""
    if not _CODECS_AVAILABLE and not allow_fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) not available in this environment; "
            "pass allow_fake=True for the deterministic stub resize"
        )
    n_bytes = max(1, (target_w * target_h) // 64)
    # honor the caller's id column name AND type in the output contract
    id_type = dict(df.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, width int, height int, "
        "resized_payload binary, resized_sha256 string"
    )

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            fakes = []
            for b in pdf["payload"]:
                d = hashlib.sha256(bytes(b) if b is not None else b"").digest()
                fakes.append((d * (n_bytes // len(d) + 1))[:n_bytes])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": [target_w] * len(pdf),
                    "height": [target_h] * len(pdf),
                    "resized_payload": fakes,
                    "resized_sha256": [hashlib.sha256(f).hexdigest() for f in fakes],
                }
            )

    flat = df.select(F.col(id_col).alias(id_col), F.col("media.payload").alias("payload"))
    return spread_for_python(flat).mapInPandas(resize, schema=out_schema)
