"""Declarative data-quality expectations — one aggregation pass, a report out.

The Deequ / Great-Expectations shape re-expressed Catalyst-first: a list of
declared constraints over a table is compiled into a SINGLE ``df.agg(...)``
(every check is one aggregate expression), so validating N constraints over
100 TB costs exactly one scan with map-side partial aggregation — never one
job per check, never a collect. The one-row aggregate is pivoted to a long
report frame with ``stack`` (still in Spark; the report never touches the
driver until the caller materializes it).

Determinism: every built-in check observes an integer violation COUNT (or a
row count), so the report is bit-stable under any partitioning / AQE re-plan
— no float summation anywhere (catalog.py determinism rules).

Scale notes:

- ``expect_unique`` uses exact ``count_distinct``. Multiple exact distinct
  aggregates in one pass trigger Catalyst's Expand (input amplification x
  #distinct-checks) — fine for a handful, and the ``approx=True`` mode swaps
  in ``approx_count_distinct`` (HLL, no Expand) for screening at extreme
  scale, where an over-threshold result should be re-verified exactly on the
  failing column alone.
- The reference has no constraint layer at all (its only integrity check is
  schema presence, reference schema.py:4-10 + reader.py row validation);
  this operator is part of the training-data-pipeline surface SURVEY.md §2.11
  mandates beyond reference parity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Check:
    """One declared constraint: ``passed iff observed <= threshold``.

    ``expr`` must be an aggregate expression producing the observed value
    (by convention: the number of violating rows, so threshold 0.0 means
    "no violations tolerated"). ``expected`` is the human-readable contract
    string carried into the report (single-quote-free: it is embedded in a
    ``stack`` literal).
    """

    name: str
    column: str
    expected: str
    expr: Column
    threshold: float = 0.0


def _nviol(cond: Column) -> Column:
    """Count of rows where ``cond`` (a violation predicate) holds."""
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("long")


def expect_not_null(column: str) -> Check:
    return Check(
        name=f"{column}_not_null",
        column=column,
        expected="no NULL values",
        expr=_nviol(F.col(column).isNull()),
    )


def expect_unique(column: str, approx: bool = False) -> Check:
    """Duplicate count among non-null values: count(col) - count(DISTINCT col)."""
    c = F.col(column)
    nd = F.approx_count_distinct(c) if approx else F.count_distinct(c)
    return Check(
        name=f"{column}_unique",
        column=column,
        expected="values are distinct",
        expr=(F.count(c) - nd).cast("long"),
    )


def expect_between(column: str, lo: float, hi: float) -> Check:
    c = F.col(column)
    return Check(
        name=f"{column}_between",
        column=column,
        expected=f"non-null values in [{lo}, {hi}]",
        expr=_nviol(c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))),
    )


def expect_in_set(column: str, values: tuple) -> Check:
    c = F.col(column)
    return Check(
        name=f"{column}_in_set",
        column=column,
        expected="non-null values in allowed set of " + str(len(values)),
        expr=_nviol(c.isNotNull() & ~c.isin(list(values))),
    )


def expect_matches(column: str, pattern: str, label: str = "pattern") -> Check:
    c = F.col(column)
    return Check(
        name=f"{column}_matches",
        column=column,
        expected=f"non-null values match {label}",
        expr=_nviol(c.isNotNull() & ~c.rlike(pattern)),
    )


def expect_row_count_at_least(n: int) -> Check:
    """Observed = shortfall below ``n`` (0 when the table is big enough)."""
    return Check(
        name="table_row_count_at_least",
        column="",
        expected=f"at least {n} rows",
        expr=F.greatest(F.lit(0).cast("long"), F.lit(n) - F.count(F.lit(1))),
    )


def expect_satisfies(name: str, column: str, predicate: Column, expected: str) -> Check:
    """Custom row-level contract: count of rows where ``predicate`` is NOT
    true (NULL predicate counts as a violation — unknown is not satisfied)."""
    return Check(
        name=name,
        column=column,
        expected=expected,
        expr=_nviol(~predicate.eqNullSafe(F.lit(True))),
    )


def evaluate_expectations(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check in ONE aggregation over ``df``.

    Returns a report frame ``(check_name, col_name, expected, observed
    double, threshold double, passed boolean)`` ordered by check name
    (``check_name`` — CHECK is a reserved word in ANSI/DuckDB). The pivot to
    long form happens via ``stack`` on the single aggregate row — the whole
    report is a Spark plan end-to-end (inspectable, unionable, writable to a
    quality-history table) rather than driver-side bookkeeping.
    """
    if not checks:
        raise ValueError("no checks declared")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")

    row = df.agg(*[c.expr.cast("double").alias(f"m{i}") for i, c in enumerate(checks)])
    cells = ", ".join(
        f"'{c.name}', '{c.column}', '{c.expected}', m{i}, CAST({c.threshold!r} AS DOUBLE)"
        for i, c in enumerate(checks)
    )
    stacked = row.selectExpr(
        f"stack({len(checks)}, {cells}) AS (check_name, col_name, expected, observed, threshold)"
    )
    return (
        stacked.withColumn("passed", F.col("observed") <= F.col("threshold"))
        .orderBy("check_name")
    )
