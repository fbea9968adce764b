from arrow_parquet_logs_spark.streaming.ingest import (
    read_log_stream,
    run_windowed_counts_once,
    start_ingest,
    start_quarantine,
    windowed_level_counts,
)

__all__ = [
    "read_log_stream",
    "run_windowed_counts_once",
    "start_ingest",
    "start_quarantine",
    "windowed_level_counts",
]
