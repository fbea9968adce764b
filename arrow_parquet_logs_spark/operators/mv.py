"""Materialized-view maintenance from a change-data feed.

The at-scale answer to "keep an aggregate fresh over a mutating 100 TB
table" is NOT a periodic full recompute — it is applying the row-level
change feed (logstore/table.py ``changes()``, Delta-CDF shape) to the
stored rollup: cost O(|delta| + |view|), never a base-table rescan.

This module maintains count + decimal-sum rollups, the self-maintainable
aggregate class: every CDF row carries enough information to update the
group (insert → +1/+value, delete → −1/−value, update pre/post-image →
−old/+new). Group-key changes need no special case — the pre-image
decrements the old group, the post-image increments the new one. Decimal
arithmetic keeps the maintained total bit-equal to a from-scratch
recompute under any partitioning (catalog.py determinism rules); the
``table_incremental_rollup`` oracle pins maintained ≡ recomputed.

Non-self-maintainable aggregates (min/max under deletes, exact distinct)
need auxiliary state (per-group heaps / count maps) — out of scope here,
as in most production incremental-view engines' first tier.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, functions as F

from arrow_parquet_logs_spark.functions.numeric import dec

#: CDF rows that add mass to their group vs remove it.
_ADDS = ("insert", "update_postimage")
_REMOVES = ("delete", "update_preimage")


def rollup_delta(
    changes: DataFrame,
    group_cols: list[str],
    count_alias: str,
    sums: Mapping[str, str],
    precision: int = 12,
    scale: int = 2,
) -> DataFrame:
    """Per-group signed delta from a CDF frame (``_change_type`` column).

    ``sums`` maps output alias → source column. Returns one row per touched
    group: ``(group_cols..., <count_alias> long, <alias> decimal, ...)``.
    """
    sign = (
        F.when(F.col("_change_type").isin(*_ADDS), F.lit(1))
        .when(F.col("_change_type").isin(*_REMOVES), F.lit(-1))
        # An unknown change type must FAIL the job, not silently contribute
        # nothing (sum skips NULLs — a typo'd CDF producer would otherwise
        # under-maintain the view without a trace).
        .otherwise(
            F.raise_error(
                F.concat(F.lit("unknown _change_type: "), F.col("_change_type"))
            ).cast("int")
        )
    )
    aggs = [F.sum(sign).cast("long").alias(count_alias)]
    for alias, col in sums.items():
        aggs.append(F.sum(dec(col, precision, scale) * sign).alias(alias))
    return changes.groupBy(*group_cols).agg(*aggs)


def apply_rollup_delta(
    view: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    count_alias: str,
    sums: Mapping[str, str],
    precision: int = 12,
    scale: int = 2,
) -> DataFrame:
    """Merge a signed delta into a stored rollup.

    ``view`` has ``(group_cols..., <count_alias> long, <alias> double ...)``
    — the double totals are cent-exact (they came from a decimal sum), so
    the cast back to decimal for the combine is lossless. Groups whose
    count reaches zero disappear; groups born in the delta appear. One
    full-outer join on the group key — O(|view| + |delta|)."""
    v = view.select(
        *group_cols,
        F.col(count_alias).alias("_vn"),
        *[dec(a, precision, scale).alias(f"_v_{a}") for a in sums],
    )
    d = delta.select(
        *group_cols,
        F.col(count_alias).alias("_dn"),
        *[F.col(a).alias(f"_d_{a}") for a in sums],
    )
    zero = F.lit(0).cast(f"decimal({precision},{scale})")
    merged = v.join(d, group_cols, "full_outer").select(
        *group_cols,
        (F.coalesce(F.col("_vn"), F.lit(0)) + F.coalesce(F.col("_dn"), F.lit(0)))
        .cast("long")
        .alias(count_alias),
        *[
            (F.coalesce(F.col(f"_v_{a}"), zero) + F.coalesce(F.col(f"_d_{a}"), zero))
            .cast("double")
            .alias(a)
            for a in sums
        ],
    )
    return merged.where(F.col(count_alias) > 0)


def maintain_count_sum_rollup(
    view: DataFrame,
    changes: DataFrame,
    group_cols: list[str],
    count_alias: str,
    sums: Mapping[str, str],
    precision: int = 12,
    scale: int = 2,
) -> DataFrame:
    """``apply_rollup_delta(view, rollup_delta(changes, ...))`` in one call."""
    delta = rollup_delta(changes, group_cols, count_alias, sums, precision, scale)
    return apply_rollup_delta(view, delta, group_cols, count_alias, sums, precision, scale)


def maintain_equijoin_view(
    view: DataFrame,
    a_now: DataFrame,
    b_now: DataFrame,
    join_cols: list[str],
    a_changes: DataFrame,
    b_changes: DataFrame,
) -> DataFrame:
    """Maintain a materialized INNER equi-join ``V = A ⋈ B`` from the two
    sides' change feeds — the join tier of incremental view maintenance.

    Strategy: AFFECTED-KEY RECOMPUTE. The join keys touched by either
    delta (every CDF row, pre- and post-image alike — a row that LEFT a
    key must invalidate that key's slice) form the affected set K; the
    new view is

        V' = (V anti⋈ K)  ∪  (A semi⋈ K) ⋈ (B semi⋈ K)

    one anti-join over the stored view plus a join restricted to the
    affected key slices of the CURRENT snapshots — cost
    O(|V| + |K-slices|), never a full A ⋈ B. Chosen over the classic
    counting algorithm (ΔV = ΔA⋈B ∪ A⋈ΔB − ΔA⋈ΔB) deliberately: keyed
    recompute is multiplicity-safe by construction — duplicate join keys,
    updates that move a row between keys, and delete/re-insert churn all
    collapse into "this key's slice is rebuilt from current truth",
    where the counting form must track per-row derivation counts to
    survive the same cases. The cost class is the same when deltas are
    key-local (the CDC norm); the contract (maintained ≡ recomputed,
    pinned by oracle and tests) is far harder to hold wrong.

    ``a_changes``/``b_changes`` need only the ``join_cols`` of their CDF
    rows (any ``_change_type``); ``a_now``/``b_now`` are the post-change
    snapshots — pass ``read_where``-pruned frames where key predicates
    allow and the slice reads skip files entirely. ``view`` and the
    returned frame share the inner-join schema (join cols + A's other
    columns + B's other columns)."""
    keys = (
        a_changes.select(*join_cols)
        .unionByName(b_changes.select(*join_cols))
        .distinct()
    )
    kept = view.join(keys, join_cols, "left_anti")
    rebuilt = (
        a_now.join(keys, join_cols, "left_semi")
        .join(b_now.join(keys, join_cols, "left_semi"), join_cols)
    )
    return kept.unionByName(rebuilt)
