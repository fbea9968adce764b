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
