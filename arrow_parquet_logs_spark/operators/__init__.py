from arrow_parquet_logs_spark.operators import (
    dedup,
    expectations,
    ivf,
    multimodal,
    relational,
    sessionize,
    similarity,
    text,
)

__all__ = [
    "dedup",
    "expectations",
    "ivf",
    "multimodal",
    "relational",
    "sessionize",
    "similarity",
    "text",
]
