from arrow_parquet_logs_spark.plans.inspect import explain_str, assert_pushed_filters, assert_broadcast

__all__ = ["explain_str", "assert_pushed_filters", "assert_broadcast"]
