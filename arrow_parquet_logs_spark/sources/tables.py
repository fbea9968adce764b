"""Driver-table loaders.

One parquet file per table under ``<sf_dir>/`` (TESTDATA.md). The driver
tables store timestamps without UTC adjustment (``isAdjustedToUTC=false``;
``events.ts`` is parquet ``TIMESTAMP(NANOS)``), so how they surface depends
on the Spark build:

- TIMESTAMP(NANOS) storage: every Spark through 4.1.2 rejects it outright
  (``PARQUET_TYPE_ILLEGAL``) unless ``spark.sql.legacy.parquet.nanosAsLong=
  true`` — which session.ensure_runtime_confs pins — so NANOS always takes
  the bigint path here, converted by integer division, the exact truncation
  DuckDB applies for TIMESTAMP_NS→TIMESTAMP.
- TIMESTAMP(MICROS/MILLIS) unadjusted storage (the shipped sf* data is µs)
  arrives as ``TIMESTAMP_NTZ``; adjusted storage as ``TIMESTAMP`` (LTZ).
  The "native" branch below covers exactly these µs NTZ/LTZ reads. Caveat
  recorded for a future Spark that reads NANOS natively: an inclusive end
  bound pushed as a µs literal against raw-ns row-group stats could prune
  sub-µs boundary rows that the legacy +999ns path includes — the bigint
  path must stay preferred for NANOS storage.

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


def normalize_ts_for_streaming(stream: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a raw event-time column to µs ``TimestampType`` (LTZ) so
    ``withWatermark`` accepts it regardless of how the parquet stored it.

    One place for all three storage drifts the driver data has shipped:

    - ``LongType`` (TIMESTAMP(NANOS) under ``nanosAsLong=true``): integer
      ``div`` to µs — a float ``/`` would round-trip ~1.7e18 ns through
      float53 and can flip a microsecond;
    - ``TimestampNTZType`` (unadjusted µs storage): ``cast("timestamp")`` —
      value-exact under the pinned UTC session tz, and the cast Spark
      requires before event-time watermarking (EVENT_TIME_IS_NOT_ON_
      TIMESTAMP_TYPE otherwise);
    - ``TimestampType``: already correct, no-op.

    Used by the registry streaming query (queries/events.py), the production
    rollup aggregation (streaming/rollup.py), and the streaming tests — one
    helper, not three copies of the type ladder (the r2 regression was
    exactly one fixed copy and two missed ones). Batch loaders use
    ``_normalize_timestamps`` below; this variant avoids ``df.dtypes``
    because streaming DataFrames expose schema the same way, and targets the
    single declared event-time column."""
    from pyspark.sql import types as T

    dt = stream.schema[col].dataType
    if isinstance(dt, T.LongType):
        stream = stream.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    elif isinstance(dt, T.TimestampNTZType):
        stream = stream.withColumn(col, F.col(col).cast("timestamp"))
    return stream


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the driver events table with ``ts``
    normalized for watermarking. File-source streams take a directory;
    glob-filter down to the one table file."""
    ensure_runtime_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_ts_for_streaming(stream)


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
