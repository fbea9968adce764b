from arrow_parquet_logs_spark.streaming.ingest import (
    read_log_stream,
    run_windowed_counts_once,
    start_ingest,
    start_quarantine,
    windowed_level_counts,
)
from arrow_parquet_logs_spark.streaming.rollup import hourly_rollup_agg, start_hourly_rollup
from arrow_parquet_logs_spark.streaming.stateful import track_heavy_hitters, track_session_counts

__all__ = [
    "hourly_rollup_agg",
    "track_heavy_hitters",
    "track_session_counts",
    "read_log_stream",
    "run_windowed_counts_once",
    "start_hourly_rollup",
    "start_ingest",
    "start_quarantine",
    "windowed_level_counts",
]
