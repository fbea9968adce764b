"""Driver-table loaders.

One parquet file per table under ``<sf_dir>/`` (TESTDATA.md). The driver
tables store timestamps without UTC adjustment (``isAdjustedToUTC=false``;
``events.ts`` is parquet ``TIMESTAMP(NANOS)``), so how they surface depends
on the Spark build:

- Spark ≤ 4.0 rejects NANOS outright (``PARQUET_TYPE_ILLEGAL``) unless
  ``spark.sql.legacy.parquet.nanosAsLong=true``, under which ``ts`` arrives
  as a long of nanoseconds — converted here by integer division, the exact
  truncation DuckDB applies for TIMESTAMP_NS→TIMESTAMP.
- Spark 4.1+ reads NANOS natively (truncated to µs) and unadjusted µs
  columns as ``TIMESTAMP_NTZ``.

Every loader normalizes to a µs ``TimestampType`` (LTZ): the session
timezone is pinned UTC (session.ensure_runtime_confs), so the NTZ→LTZ cast
is value-exact and every downstream operator (``unix_micros``, watermarking,
interval frames) sees one timestamp type regardless of the Spark build.

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


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """NTZ → LTZ on every timestamp column (exact under the pinned UTC
    session tz). One projection, no shuffle; filters applied by callers
    *before* this cast still push to the scan."""
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # long ns → µs timestamp (truncating `div`, matches DuckDB's cast)
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return _normalize_timestamps(df)


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
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":  # legacy nanosAsLong read: filter the RAW ns long
        if start:
            df = df.where(F.col("ts") >= F.unix_micros(F.lit(start).cast("timestamp")) * 1000)
        if end:
            df = df.where(F.col("ts") <= F.unix_micros(F.lit(end).cast("timestamp")) * 1000 + 999)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Native timestamp storage: compare in the column's OWN type so the
    # predicate reaches the parquet reader (a filter through a cast pushes
    # nothing — fatal at 100 TB). NTZ literals are wall-clock == the UTC
    # LTZ bounds, so inclusive [start, end] semantics are unchanged.
    lit_type = "timestamp_ntz" if ts_type == "timestamp_ntz" else "timestamp"
    if start:
        df = df.where(F.col("ts") >= F.lit(start).cast(lit_type))
    if end:
        df = df.where(F.col("ts") <= F.lit(end).cast(lit_type))
    return _normalize_timestamps(df)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view for the SQL API."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
