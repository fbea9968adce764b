from arrow_parquet_logs_spark.operators import (
    dedup,
    ivf,
    multimodal,
    relational,
    sessionize,
    similarity,
    text,
)

__all__ = ["dedup", "ivf", "multimodal", "relational", "sessionize", "similarity", "text"]
