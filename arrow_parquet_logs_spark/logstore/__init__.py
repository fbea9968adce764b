from arrow_parquet_logs_spark.logstore.filters import compile_filters, FilterError
from arrow_parquet_logs_spark.logstore.store import LogStore

__all__ = ["compile_filters", "FilterError", "LogStore"]
