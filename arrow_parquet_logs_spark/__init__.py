"""arrow_parquet_logs_spark — a PySpark-native analytics engine.

A from-scratch Spark re-expression of the capabilities of the reference
log-analytics engine ``exclowd/arrow-parquet-logs`` (a single-node
Arrow/Parquet log server), extended with the relational + LLM-data-pipeline
operator surface a 100 TB training-data platform needs:

- two-tier partitioned Parquet log store (hot landing tier ∪ compacted
  archive tier) with strict-schema JSON ingest and exactly-once compaction
  (``logstore``),
- a ``(col, op, val)`` filter compiler to Catalyst expressions with loud
  failure on unknown operators (``logstore.filters``),
- the full relational surface: scans, filters, joins (broadcast / sort-merge
  / semi / anti), aggregations, windows, set ops, top-k (``queries``),
- dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
  similarity search (brute-force + IVF-style), text analysis, multimodal
  binary-column plumbing (``operators``),
- Structured Streaming ingest with watermarks (``streaming``).

Design stance (Spark-first, not a port): declare logical plans with the
DataFrame API, let Catalyst/Tungsten pick physical strategy; Arrow-vectorized
pandas UDFs only where built-ins can't express the semantics; every operator
written to survive a 1000-executor / 100 TB scale-up (broadcast the small
side, partition-prune via layout, band/bucket the quadratic candidate joins).
"""

__version__ = "0.1.0"

from arrow_parquet_logs_spark.session import get_spark, ensure_runtime_confs

__all__ = ["get_spark", "ensure_runtime_confs", "__version__"]
