"""Canonical schemas.

``LOG_SCHEMA`` mirrors the reference's single fixed Arrow schema
(reference schema.py:4-10): ``timestamp(us, UTC), level, message, container,
session`` — strings validated, timestamp ingested from ISO-8601 (incl. ``Z``,
reference writer.py:63-67). The session timezone is pinned to UTC so
``TimestampType`` round-trips as µs UTC.
"""

from __future__ import annotations

from pyspark.sql import types as T

LOG_COLUMNS = ["timestamp", "level", "message", "container", "session"]

LOG_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("level", T.StringType(), False),
        T.StructField("message", T.StringType(), False),
        T.StructField("container", T.StringType(), False),
        T.StructField("session", T.StringType(), False),
    ]
)

#: Ingest-side schema: rows arrive as JSON with an ISO-8601 string timestamp
#: (reference writer.py:47-53); container/session are appended as constant
#: columns from the request path (reference writer.py:72-74).
LOG_INGEST_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType(), False),
        T.StructField("level", T.StringType(), False),
        T.StructField("message", T.StringType(), False),
    ]
)

#: Multimodal "opaque payload + typed metadata" column group (engine
#: extension; no reference equivalent). The payload is an opaque binary blob;
#: metadata is a typed struct so Catalyst can prune/push down on it without
#: touching bytes.
MEDIA_STRUCT = T.StructType(
    [
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image/audio/video
        T.StructField("format", T.StringType(), True),  # png/wav/mp4/...
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)
