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
        docs.select("doc_id", F.col("text").cast("binary").alias("raw")), "raw", "image", "png"
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
