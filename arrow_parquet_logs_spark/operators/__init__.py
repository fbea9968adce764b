from arrow_parquet_logs_spark.operators import (
    dedup,
    multimodal,
    relational,
    sessionize,
    similarity,
    text,
)

__all__ = ["dedup", "multimodal", "relational", "sessionize", "similarity", "text"]
