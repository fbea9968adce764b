"""Driver-table loaders.

One parquet file per table under ``<sf_dir>/`` (TESTDATA.md). The only
special case is ``events``: its ``ts`` column is parquet ``TIMESTAMP(NANOS)``,
which Spark's vectorized reader rejects outright
(``PARQUET_TYPE_ILLEGAL``). We read it under
``spark.sql.legacy.parquet.nanosAsLong=true`` (ts arrives as a long of
nanoseconds) and convert to a µs ``TimestampType`` by integer division —
the exact truncation DuckDB applies when it casts TIMESTAMP_NS→TIMESTAMP,
so oracle comparisons agree to the microsecond.

At 100 TB these would be partitioned datasets, not single files; loaders take
a directory so the same code reads a partitioned layout unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from arrow_parquet_logs_spark.session import ensure_runtime_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # long ns → µs timestamp (truncating `div`, matches DuckDB's cast)
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_events_range(
    spark: SparkSession, sf_dir: str, start: str | None = None, end: str | None = None
) -> DataFrame:
    """events scan with a time-range predicate that actually pushes down.

    The µs ``ts`` is derived from the raw ns long, and filters on a derived
    column never reach the parquet reader (plan shows only IsNotNull — no
    row-group skipping, fatal at 100 TB). Since truncation is monotonic, an
    inclusive µs range [start, end] is exactly ns ∈ [start·1000, end·1000+999]
    on the RAW column — so we filter the long column first (pushed, stats
    prune row groups) and convert after. Bounds stay inclusive on both ends
    (reference reader.py:469-472 semantics).
    """
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") != "bigint":  # plain µs/ms storage: direct pushdown
        if start:
            df = df.where(F.col("ts") >= F.lit(start).cast("timestamp"))
        if end:
            df = df.where(F.col("ts") <= F.lit(end).cast("timestamp"))
        return df
    if start:
        df = df.where(F.col("ts") >= F.unix_micros(F.lit(start).cast("timestamp")) * 1000)
    if end:
        df = df.where(F.col("ts") <= F.unix_micros(F.lit(end).cast("timestamp")) * 1000 + 999)
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view for the SQL API."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
