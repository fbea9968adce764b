"""Event-time operators: gap sessionization, tumbling windows, session
windows — the stream-analytics surface the reference stores data for but
cannot compute (SURVEY.md §2.9: no windows, no event-time aggregation).

All are single-shuffle plans keyed on the entity column; the lag/cumsum
sessionization and the native ``session_window`` produce identical islands
(new session when gap ≥ threshold — session_window's half-open semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def with_session_ids(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts", tiebreak: str = "event_id",
    gap: str = "6 hours",
) -> DataFrame:
    """lag → gap≥threshold → cumulative-sum session ids (the batch-window
    formulation; ``session_window`` is the native-operator formulation)."""
    gap_us = _gap_us(gap)
    w = W.partitionBy(user_col).orderBy(ts_col, tiebreak)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = F.when(prev.isNull() | (F.unix_micros(F.col(ts_col)) - prev >= gap_us), 1).otherwise(0)
    cum = W.partitionBy(user_col).orderBy(ts_col, tiebreak).rowsBetween(W.unboundedPreceding, W.currentRow)
    return events.withColumn("__new", is_new).withColumn("session_id", F.sum("__new").over(cum)).drop("__new")


def _gap_us(gap: str) -> int:
    qty, unit = gap.split()
    units = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    mult = units.get(unit.rstrip("s").lower())
    if mult is None:
        raise ValueError(f"unsupported gap unit {unit!r} (use second/minute/hour/day[s])")
    return int(qty) * mult * 1_000_000


def session_stats(events: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
                  gap: str = "6 hours") -> DataFrame:
    """Per-user session counts (lag/cumsum formulation)."""
    s = with_session_ids(events, user_col, ts_col, gap=gap)
    return (
        s.groupBy(user_col)
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(user_col)
    )


def tumbling_counts(events: DataFrame, ts_col: str = "ts", duration: str = "1 hour") -> DataFrame:
    """Tumbling event-time window aggregation (epoch-aligned)."""
    win = F.window(F.col(ts_col), duration)
    return (
        events.groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
        .orderBy("window_start")
    )


def session_windows(events: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
                    gap: str = "6 hours") -> DataFrame:
    """Native session_window operator: per-(user, island) start/end/count;
    end = last event + gap (half-open)."""
    return (
        events.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy(user_col, "session_start")
    )
