"""Production streaming rollup sink — append mode, watermark-closed windows,
partitioned parquet.

The registry query `events_stream_hourly_rollup` (queries/events.py) proves
streaming≡batch window semantics against the DuckDB oracle with a
complete-mode memory sink — the right *oracle shape* but a driver-side
bottleneck as a production path: complete mode re-emits every window each
micro-batch and the memory sink materializes all state on the driver.

This module is the production form of the same aggregation:

- **append** output mode: a window row is emitted exactly once, when the
  watermark passes its end — per-batch output is proportional to newly
  closed windows, not total history;
- **parquet file sink** with its own commit log (exactly-once across
  restarts via checkpointLocation), partitioned by ``dt`` so downstream
  time-range readers prune at directory level;
- state is bounded by the watermark horizon: the store holds only windows
  the watermark hasn't passed.

On a finite input the final ``watermark`` worth of windows stays open by
design (nothing can prove them complete); a continuous job closes them as
new data advances the watermark. The streaming≡batch equality test pins
emitted windows against the batch twin restricted to the watermark horizon
(tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hourly_rollup_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling event-time count — the shared shape of the
    memory-sink oracle twin and the production sink below.

    The event-time column is normalized (long-ns / NTZ → TimestampType)
    before the watermark, so a stream built straight off driver parquet —
    whatever timestamp physical type it ships — is accepted; already-normal
    streams pass through unchanged."""
    from arrow_parquet_logs_spark.sources.tables import normalize_ts_for_streaming

    stream = normalize_ts_for_streaming(stream, ts_col)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


def start_hourly_rollup(
    stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Append-mode hourly rollup into ``dt=``-partitioned parquet.

    Each emitted row lands once (file-sink commit log + append mode), under
    its window's calendar date — a 100× time-range scan over the rollup
    prunes whole directories. Drop ``available_now`` for a continuous
    daemon."""
    agg = hourly_rollup_agg(stream, ts_col, window, watermark).withColumn(
        "dt", F.to_date("window_start")
    )
    writer = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .partitionBy("dt")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_rollup_upsert(
    stream: DataFrame,
    table,
    checkpoint: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
    optimize_every: int | None = None,
):
    """UPDATE-mode rollup maintained as a queryable table: each micro-batch
    emits the windows whose counts CHANGED, and foreachBatch MERGEs them
    into a ``VersionedTable`` keyed on ``window_start`` (partitioned by
    ``dt`` → only touched days rewrite, the partition-granular
    copy-on-write path).

    This is the third rollup form, completing the trade-off triangle:
    complete-mode memory sink (oracle twin), append-mode file sink (closed
    windows only, exactly-once files), and THIS — a continuously-correct
    materialized view: still-open windows are present with their current
    counts (append mode withholds them until the watermark passes), every
    read sees a consistent snapshot (manifest protocol), history is
    time-travelable, and ``optimize_every`` bounds file accumulation on a
    long stream. Restarts resume from the checkpoint; a re-delivered
    batch MERGEs the same values — idempotent by keys."""
    agg = hourly_rollup_agg(stream, ts_col, window, watermark).withColumn(
        "dt", F.to_date("window_start").cast("string")
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        r = table.upsert(batch_df)
        if optimize_every and r["version"] % optimize_every == 0:
            table.optimize()

    writer = (
        agg.writeStream.outputMode("update")
        .foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
