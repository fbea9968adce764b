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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance: str | None = None,
    allow_exact: bool = True,
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: every LEFT row gains the most recent RIGHT row with
    ``right_ts ≤ left_ts`` (``direction='backward'``, the default; strictly
    ``<`` when ``allow_exact=False``) or the EARLIEST right row with
    ``right_ts ≥ left_ts`` (``direction='forward'``) per join key — the
    point-in-time enrichment every event pipeline needs (prices as-of
    trade, last-touch attribution, config as-of event; pandas
    ``merge_asof`` semantics).

    Spark has no native as-of join, and the naive inequality join is
    quadratic; this is the scale formulation: tag both sides, UNION into
    one stream, ONE shuffle on the key, and carry the right side's columns
    forward with ``last(..., ignorenulls=True)`` over the time-ordered
    window — cost identical to a window aggregate regardless of how far
    back the match lies. Right rows sort before (after) left rows at equal
    timestamps to realize inclusive (strict) semantics; pass ``tiebreak``
    (a right-side column) to make same-timestamp right rows deterministic.
    ``tolerance`` (an SQL interval string, e.g. ``'2 hours'``) nulls out
    matches older than ``left_ts - tolerance`` — matches pandas
    ``merge_asof`` semantics.

    Carried columns surface as ``<col><suffix>`` plus ``<left_ts><suffix>``
    for the matched timestamp; left rows with no qualifying right row keep
    NULLs (left-outer as-of)."""
    from pyspark.sql import Window as W

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    fwd = direction == "forward"
    keys = [on] if isinstance(on, str) else list(on)
    r_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != r_ts]
    if left_ts in right_cols:
        raise ValueError(
            f"right column {left_ts!r} would collide with the matched-timestamp "
            f"output {left_ts}{suffix!r} — rename it or pass right_cols without it"
        )

    # side ordering realizes the equality semantics: backward wants an
    # equal-ts right row VISIBLE to the carry (right sorts first, side 0);
    # forward mirrors it (right sorts after left, side 2). Strict mode
    # flips the side value so the equal-ts right row lands out of frame.
    r_side = (2 if allow_exact else 0) if fwd else (0 if allow_exact else 2)
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast("timestamp").alias("__match_ts"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in keys],
        F.col(r_ts).cast("timestamp").alias(left_ts),
        F.lit(r_side).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(r_ts).cast("timestamp").alias("__match_ts"),
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    order = [F.col(left_ts), F.col("__side")]
    if tiebreak is not None:
        tb = F.col(f"__r_{tiebreak}") if tiebreak in right_cols else F.col(tiebreak)
        # forward wants the EARLIEST qualifying right row; with a
        # descending-frame carry the tiebreak flips to keep it nearest
        order.append(tb.desc() if fwd else tb)
    if fwd:
        w = W.partitionBy(*keys).orderBy(*order).rowsBetween(
            W.currentRow, W.unboundedFollowing
        )
        carry = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    else:
        w = W.partitionBy(*keys).orderBy(*order).rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
        carry = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    carried = merged.select(
        "*",
        *[carry(f"__r_{c}").over(w).alias(f"__c_{c}") for c in right_cols],
        carry("__match_ts").over(w).alias("__c_match_ts"),
    )
    out = carried.where(F.col("__side") == 1)
    ok = F.col("__c_match_ts").isNotNull()
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        ok = ok & (
            (F.col("__c_match_ts") <= F.col(left_ts) + tol)
            if fwd
            else (F.col("__c_match_ts") >= F.col(left_ts) - tol)
        )
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.when(ok, F.col(f"__c_{c}")).alias(f"{c}{suffix}") for c in right_cols],
        F.when(ok, F.col("__c_match_ts")).alias(f"{left_ts}{suffix}"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str] = ("s", "e"),
    right_cols: tuple[str, str] = ("s", "e"),
    bucket_unit: str = "day",
    pair_budget: int | None = None,
) -> DataFrame:
    """Interval × interval OVERLAP join without a nested loop — completing
    the range-join family (``interval_join_by_bucket`` above covers
    point-in-interval; ``asof_join`` covers nearest-preceding).

    Overlap is the symmetric predicate ``a.s <= b.e AND b.s <= a.e``.
    Naively that plans as BroadcastNestedLoopJoin; instead BOTH sides
    explode onto the time buckets they touch and equi-join on the bucket.
    The classic problem — a pair overlapping several shared buckets would
    emit several times — is solved without any distinct: a pair is kept
    only in the bucket containing ``greatest(a.s, b.s)`` (the overlap's
    first instant), which for any overlapping pair exists in exactly one
    shared bucket. One hash shuffle per side; cost O(intervals ×
    avg_span_buckets); pick ``bucket`` near the typical interval span so
    the explode factor stays small while buckets stay selective.

    Both timestamp columns must be TimestampType; columns are kept from
    both sides with left's prefixed ``a_`` and right's ``b_``.

    ``pair_budget``: opt-in DENSITY GUARD for cluster runs. When many
    intervals are live in the same bucket, the per-bucket join work is
    Σ_cell |a_cell|·|b_cell| — and when the intervals genuinely all
    overlap, the ANSWER itself is |A|×|B|-quadratic and no join strategy
    can beat its own output size (the sf10 probe measured ~10¹⁰ candidate
    rows on 0.7M × 0.45M near-concurrent sessions and spilled a 77 GB
    disk). With a budget set, one cheap aggregation prices the candidate
    count exactly and raises a LOUD error naming the density and the
    remedies (finer ``bucket_unit`` only helps when density is an
    artifact of coarse buckets; pre-filtering the panels or aggregating
    per-bucket instead of per-pair is the answer when the overlap is
    real) — failing fast instead of grinding a cluster for hours.
    """
    ls, le = left_cols
    rs, re_ = right_cols
    a = left.select([F.col(c).alias(f"a_{c}") for c in left.columns])
    b = right.select([F.col(c).alias(f"b_{c}") for c in right.columns])
    step = F.expr(f"INTERVAL 1 {bucket_unit}")

    def cells(s: str, e: str) -> Column:
        return F.explode(
            F.sequence(
                F.date_trunc(bucket_unit, F.col(s)),
                F.date_trunc(bucket_unit, F.col(e)),
                step,
            )
        )

    ax = a.select("*", cells(f"a_{ls}", f"a_{le}").alias("__cell"))
    bx = b.select("*", cells(f"b_{rs}", f"b_{re_}").alias("__cell"))
    if pair_budget is not None:
        ca = ax.groupBy("__cell").agg(F.count(F.lit(1)).alias("_na"))
        cb = bx.groupBy("__cell").agg(F.count(F.lit(1)).alias("_nb"))
        est = (
            ca.join(cb, "__cell")
            .agg(F.sum(F.col("_na") * F.col("_nb")).cast("long").alias("w"))
            .collect()[0]["w"]
            or 0
        )
        if est > pair_budget:
            raise ValueError(
                f"interval_overlap_join candidate count {est:,} exceeds "
                f"pair_budget={pair_budget:,} at bucket_unit={bucket_unit!r} — "
                "the per-bucket interval density makes this join (and likely "
                "its answer) quadratic. Remedies: a finer bucket_unit if the "
                "density is bucket-coarseness, tighter panel pre-filters, or "
                "a per-bucket aggregate instead of per-pair output."
            )
    overlap = (F.col(f"a_{ls}") <= F.col(f"b_{re_}")) & (
        F.col(f"b_{rs}") <= F.col(f"a_{le}")
    )
    first_cell = F.date_trunc(
        bucket_unit, F.greatest(F.col(f"a_{ls}"), F.col(f"b_{rs}"))
    )
    return (
        ax.join(bx, "__cell")
        .where(overlap & (F.col("__cell") == first_cell))
        .drop("__cell")
    )
