"""Skew-handling relational helpers: salting for hot keys.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins
automatically; these explicit operators cover the cases AQE doesn't — hot-key
*aggregations* and broadcast-infeasible joins against skewed build sides —
and make the technique available as a first-class, testable primitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    final_aggs: list[Column],
    salt: int = 8,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt on the partial phase.

    Phase 1 groups on (keys…, salt ∈ [0, salt)) so one hot key spreads over
    ``salt`` reducers; phase 2 merges the partials on the true keys. The
    caller supplies matching partial (`aggs`) and merge (`final_aggs`)
    expressions — e.g. count → sum, sum → sum, min → min.

    (Spark's hash aggregate already does map-side partials; the salt phase
    matters when the *reduce* side of a single key exceeds one task, e.g.
    high-cardinality DISTINCT under one hot group.)
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    left: DataFrame, right: DataFrame, key: str, salt: int = 8
) -> DataFrame:
    """Skewed equi-join: salt the (large, skewed) left side randomly and
    explode the (smaller) right side across all salt values, so one hot key's
    rows land in ``salt`` different tasks instead of one straggler.

    Right-side rows replicate ``salt``× — use when the right side is too big
    to broadcast outright but small enough to replicate; otherwise rely on
    AQE skew-join splitting.
    """
    lsalt = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    rsalt = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = lsalt.join(rsalt, [key, "__salt"])
    return out.drop("__salt")


def interval_join_by_bucket(
    events: DataFrame,
    windows: DataFrame,
    ts_col: str = "ts",
    start_col: str = "s",
    end_col: str = "e",
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join without a nested-loop: bucketize time, equi-join
    on the bucket, refine with the exact containment predicate.

    Spark has no native range join — the naive ``ON ts BETWEEN s AND e``
    plans as BroadcastNestedLoopJoin (quadratic, broadcast-bound). Instead:
    each window explodes into the hour buckets it overlaps; each event maps
    to exactly ONE bucket, so the bucket equi-join meets every qualifying
    (event, window) pair exactly once (no post-join dedup) and shuffles hash-
    partitioned on the bucket key like any equi-join. Cost is
    O(windows × avg_span_hours + events); pick the bucket width of the
    typical window span at your scale.

    ``how='left_windows'`` keeps windows with no events (for per-window
    aggregation with zero counts): the inner bucket-join result, plus
    exactly ONE all-NULL-events row per unmatched window (an anti-join on
    the window columns — not a LEFT from the exploded frame, which would
    emit one NULL row per empty covered bucket and inflate any
    ``count(*)``-style per-window aggregate).
    """
    hb = F.explode(
        F.sequence(
            F.date_trunc("hour", F.col(start_col)),
            F.date_trunc("hour", F.col(end_col)),
            F.expr("INTERVAL 1 HOUR"),
        )
    ).alias("__hb")
    w = windows.select("*", hb)
    ev = events.withColumn("__hb", F.date_trunc("hour", F.col(ts_col)))
    contained = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    inner = w.join(ev, "__hb").where(contained).drop("__hb")
    if how == "left_windows":
        matched = inner.select(*windows.columns).distinct()
        unmatched = windows.join(matched, windows.columns, "left_anti").select(
            "*",
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in events.schema.fields
            ],
        )
        return inner.unionByName(unmatched)
    return inner
