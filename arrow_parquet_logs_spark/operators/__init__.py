from arrow_parquet_logs_spark.operators import dedup, multimodal, sessionize, similarity, text

__all__ = ["dedup", "multimodal", "sessionize", "similarity", "text"]
