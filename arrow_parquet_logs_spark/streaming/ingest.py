"""Structured Streaming ingest — the reference's hand-rolled micro-batching
(SURVEY.md §2.9 T1-T8) re-expressed as Spark streaming primitives:

| reference behavior                     | here |
|----------------------------------------|------|
| per-(container,session) buffers (T1)   | ``partitionBy('container','session')`` sink |
| size-based rotation (T2)               | micro-batch files + LogStore.compact |
| async flush pool (T3)                  | micro-batch execution itself |
| counter.txt crash-safe naming (T4)     | checkpointLocation |
| graceful drain (T6, deadlocks in ref)  | ``query.stop()`` + checkpoint recovery |
| no late-data policy (T7)               | ``withWatermark`` on event-time aggs |
| read-your-writes (T8)                  | committed micro-batches are parquet → LogStore reads them |

The hot tier lands as parquet micro-batches in the LogStore ``landing``
layout, so batch reads (LogStore.read_df) see streamed rows immediately and
compaction folds them into archive versions exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from arrow_parquet_logs_spark.schema import LOG_INGEST_SCHEMA
from arrow_parquet_logs_spark.session import ensure_runtime_confs


def _raw_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    ensure_runtime_confs(spark)
    from pyspark.sql import types as T

    # fresh StructType — StructType.add mutates in place, and the ingest
    # schema is a shared module-level constant
    schema = T.StructType(
        list(LOG_INGEST_SCHEMA.fields)
        + [T.StructField("container", T.StringType()), T.StructField("session", T.StringType())]
    )
    return spark.readStream.schema(schema).json(src_dir)


def _name_ok(col: str):
    """Streaming twin of LogStore._check_name's strict charset: names become
    Hive partition directory components via partitionBy, which URL-escapes
    anything outside the charset (':' → '%3A') — the escaped form then
    surfaces in the catalog and restored columns, and the original name can
    never be queried because the batch entry points reject it. Reject at the
    stream boundary instead so disk names always round-trip. NULL-safe:
    a missing name is invalid, not three-valued-unknown (a bare rlike(NULL)
    would evaluate NULL and the row would vanish from BOTH the ingest and
    the quarantine stream)."""
    return (
        F.col(col).isNotNull()
        & F.col(col).rlike("^[A-Za-z0-9_.-]+$")
        & ~F.col(col).rlike("^\\.+$")
    )


def read_log_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream of JSON-lines ingest records:
    ``{"timestamp": ISO-8601, "level": ..., "message": ..., "container":
    ..., "session": ...}`` (the POST body rows of reference main.py:302-337,
    with the path params inlined).

    Timestamps parse with ``try_to_timestamp`` and unparseable rows are
    FILTERED OUT here, not thrown on: under ANSI mode a strict cast would
    poison the micro-batch — the bad file is retried forever and the whole
    ingest pipeline wedges on one malformed row. Container/session names
    outside the store's strict charset are filtered the same way (they would
    land URL-escaped on disk and never round-trip). The batch path
    (LogStore.write_logs) keeps per-row strict rejection at the request
    boundary (reference writer.py:81-93 parity); the streaming path
    quarantines instead — see :func:`start_quarantine`."""
    raw = _raw_stream(spark, src_dir)
    return (
        raw.select(
            F.try_to_timestamp("timestamp").alias("timestamp"),
            "level",
            "message",
            "container",
            "session",
        )
        .where(F.col("timestamp").isNotNull())
        .where(_name_ok("container") & _name_ok("session"))
    )


def start_quarantine(spark: SparkSession, src_dir: str, quarantine_dir: str, checkpoint: str):
    """Companion stream capturing rows the ingest filter dropped (bad or
    missing timestamp), with the raw timestamp string preserved for triage.
    Own checkpoint → independent, exactly-once via the file-sink commit log."""
    raw = _raw_stream(spark, src_dir)
    bad_ts = F.try_to_timestamp("timestamp").isNull()
    bad_name = ~(_name_ok("container") & _name_ok("session"))
    bad = raw.where(bad_ts | bad_name).withColumn(
        "reject_reason", F.when(bad_ts, F.lit("bad_timestamp")).otherwise(F.lit("bad_name"))
    )
    return (
        bad.writeStream.format("parquet")
        .option("path", quarantine_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_ingest(
    spark: SparkSession, src_dir: str, store_root: str, checkpoint: str, available_now: bool = True
):
    """Stream into the LogStore landing tier, partitioned by (container,
    session). ``availableNow`` drains everything present then stops — the
    batch-friendly trigger; drop it for a long-running ingest daemon."""
    df = read_log_stream(spark, src_dir)
    writer = (
        df.writeStream.format("parquet")
        .option("path", f"{store_root}/landing")
        .option("checkpointLocation", checkpoint)
        .partitionBy("container", "session")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_log_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """At-least-once ingest → effectively-once rows: drop duplicate
    (container, session, timestamp, message) records arriving within the
    watermark horizon. State is bounded by the watermark — the streaming
    form of §2.11's exact dedup, covering producer retries the reference
    would store twice."""
    return stream.withWatermark("timestamp", watermark).dropDuplicatesWithinWatermark(
        ["container", "session", "timestamp", "message"]
    )


def windowed_level_counts(
    stream: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Event-time tumbling counts per level with a late-data watermark —
    the streaming aggregation the reference stores data for but can't run."""
    return (
        stream.withWatermark("timestamp", watermark)
        .groupBy(F.window("timestamp", window).alias("w"), "level")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "level", "n")
    )


def run_windowed_counts_once(
    spark: SparkSession, src_dir: str, query_name: str = "level_counts"
) -> DataFrame:
    """Drive the windowed agg to completion over the files currently in
    ``src_dir`` (memory sink + availableNow) and return the result table."""
    stream = read_log_stream(spark, src_dir)
    q = (
        windowed_level_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def error_context_join(
    errors: DataFrame, context: DataFrame, lookback: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Stream-stream interval join: each ERROR row paired with the non-error
    rows of the same (container, session) in the ``lookback`` window ending
    at the error — the "what led up to this error" query, live. Both sides
    carry watermarks and the join condition bounds event-time distance, so
    Spark can expire buffered state: per-key state holds at most
    watermark + lookback of rows regardless of stream length (the unbounded
    state that sinks naive stream joins). Keys shuffle-partition both sides
    identically — the join is co-located, no broadcast of a stream."""
    e = errors.where(F.col("level") == "ERROR").select(
        F.col("container").alias("e_container"),
        F.col("session").alias("e_session"),
        F.col("timestamp").alias("e_ts"),
        F.col("message").alias("e_message"),
    ).withWatermark("e_ts", watermark)
    c = context.where(F.col("level") != "ERROR").select(
        F.col("container").alias("c_container"),
        F.col("session").alias("c_session"),
        F.col("timestamp").alias("c_ts"),
        F.col("level").alias("c_level"),
        F.col("message").alias("c_message"),
    ).withWatermark("c_ts", watermark)
    cond = (
        (F.col("e_container") == F.col("c_container"))
        & (F.col("e_session") == F.col("c_session"))
        & (F.col("c_ts") >= F.col("e_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("c_ts") <= F.col("e_ts"))
    )
    return e.join(c, cond, "inner").select(
        F.col("e_container").alias("container"),
        F.col("e_session").alias("session"),
        "e_ts",
        "e_message",
        "c_ts",
        "c_level",
        "c_message",
    )
