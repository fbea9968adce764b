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
