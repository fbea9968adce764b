from arrow_parquet_logs_spark.streaming.ingest import (
    read_log_stream,
    run_windowed_counts_once,
    start_ingest,
    start_quarantine,
    windowed_level_counts,
)
from arrow_parquet_logs_spark.streaming.rollup import hourly_rollup_agg, start_hourly_rollup

__all__ = [
    "hourly_rollup_agg",
    "read_log_stream",
    "run_windowed_counts_once",
    "start_hourly_rollup",
    "start_ingest",
    "start_quarantine",
    "windowed_level_counts",
]
