"""Operator-level tests for the declarative expectations engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arrow_parquet_logs_spark.operators.expectations import (
    evaluate_expectations,
    expect_between,
    expect_in_set,
    expect_matches,
    expect_not_null,
    expect_row_count_at_least,
    expect_satisfies,
    expect_unique,
)


@pytest.fixture(scope="module")
def dirty(spark):
    # 6 rows: one NULL id, one duplicate id, one out-of-range score,
    # one bad category, one malformed code.
    rows = [
        (1, 10.0, "a", "X1"),
        (2, 20.0, "b", "X2"),
        (2, 30.0, "a", "X3"),      # dup id
        (None, 40.0, "a", "X4"),   # null id
        (5, 999.0, "z", "X5"),     # score out of range + bad category
        (6, 50.0, "b", "bad"),     # malformed code
    ]
    return spark.createDataFrame(rows, "id int, score double, cat string, code string")


def _report(df, checks):
    rep = evaluate_expectations(df, checks)
    return {r["check_name"]: r.asDict() for r in rep.collect()}


def test_violation_counts_and_pass_flags(dirty):
    got = _report(dirty, [
        expect_not_null("id"),
        expect_unique("id"),
        expect_between("score", 0, 100),
        expect_in_set("cat", ("a", "b")),
        expect_matches("code", r"^X[0-9]+$", label="X-code"),
        expect_row_count_at_least(10),
    ])
    assert got["id_not_null"]["observed"] == 1.0 and not got["id_not_null"]["passed"]
    # 5 non-null ids over 4 distinct values -> 1 duplicate
    assert got["id_unique"]["observed"] == 1.0 and not got["id_unique"]["passed"]
    assert got["score_between"]["observed"] == 1.0
    assert got["cat_in_set"]["observed"] == 1.0
    assert got["code_matches"]["observed"] == 1.0
    # 6 rows, floor of 10 -> shortfall 4
    assert got["table_row_count_at_least"]["observed"] == 4.0
    assert not got["table_row_count_at_least"]["passed"]


def test_clean_table_all_pass(dirty):
    clean = dirty.where(F.col("id").isNotNull() & (F.col("id") != 2))
    got = _report(clean, [
        expect_not_null("id"),
        expect_unique("id"),
        expect_between("score", 0, 1000),
        expect_row_count_at_least(2),
    ])
    assert all(v["passed"] for v in got.values())
    assert all(v["observed"] == 0.0 for v in got.values())


def test_threshold_tolerance(dirty):
    # A nonzero threshold turns a small violation count into a pass.
    chk = expect_not_null("id")
    tolerant = type(chk)(chk.name, chk.column, chk.expected, chk.expr, threshold=1.0)
    got = _report(dirty, [tolerant])
    assert got["id_not_null"]["observed"] == 1.0 and got["id_not_null"]["passed"]


def test_satisfies_null_predicate_is_violation(spark):
    # NULL predicate result (NULL comparison) must count as a violation.
    df = spark.createDataFrame([(1, None), (2, 5)], "id int, v int")
    got = _report(df, [
        expect_satisfies("v_positive", "v", F.col("v") > 0, "v positive"),
    ])
    assert got["v_positive"]["observed"] == 1.0


def test_approx_unique_mode(spark):
    df = spark.range(1000).withColumn("k", F.col("id") % 100)
    got = _report(df, [expect_unique("k", approx=True)])
    # ~900 duplicates; HLL error at this cardinality is tiny but nonzero.
    assert 850.0 <= got["k_unique"]["observed"] <= 950.0
    assert not got["k_unique"]["passed"]


def test_single_aggregation_pass(dirty):
    # All checks must compile into one aggregate over the input — the plan
    # contains exactly one scan of the source (no per-check jobs/unions of
    # aggregates over repeated scans).
    rep = evaluate_expectations(dirty, [
        expect_not_null("id"),
        expect_between("score", 0, 100),
        expect_in_set("cat", ("a", "b")),
        expect_row_count_at_least(10),
    ])
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LocalRelation") + plan.count("LogicalRDD") == 1, plan


def test_errors(dirty):
    with pytest.raises(ValueError, match="no checks"):
        evaluate_expectations(dirty, [])
    with pytest.raises(ValueError, match="duplicate check names"):
        evaluate_expectations(dirty, [expect_not_null("id"), expect_not_null("id")])
