"""Meta-tests: the differential harness must actually be able to fail.

A comparison utility with a bug that always passes would silently green
every oracle test — these force it to reject value, row-count, and column
mismatches."""

from __future__ import annotations

import pytest

from tests.parity import canonical_rows, compare, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


def test_compare_detects_value_mismatch(spark, duck):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(AssertionError, match="differing row"):
        compare(df, duck, "SELECT CAST(1 AS BIGINT) AS id, 'b' AS s", "meta")


def test_compare_detects_row_count_mismatch(spark, duck):
    df = spark.createDataFrame([(1,), (2,)], "id long")
    with pytest.raises(AssertionError, match="row count"):
        compare(df, duck, "SELECT CAST(1 AS BIGINT) AS id", "meta")


def test_compare_detects_column_mismatch(spark, duck):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(AssertionError, match="column mismatch"):
        compare(df, duck, "SELECT CAST(1 AS BIGINT) AS wrong_name", "meta")


def test_compare_passes_on_equal(spark, duck):
    df = spark.createDataFrame([(1, 1.5), (2, None)], "id long, v double")
    compare(df, duck, "SELECT * FROM (VALUES (CAST(1 AS BIGINT), 1.5), (2, NULL)) t(id, v)", "meta")


def test_canonical_rows_order_insensitive():
    import pandas as pd

    a = pd.DataFrame({"x": [1, 2], "y": ["b", "a"]})
    b = pd.DataFrame({"y": ["a", "b"], "x": [2, 1]})  # different row & col order
    assert canonical_rows(a) == canonical_rows(b)


def test_canonical_rows_float_distinguishes_close_values():
    import pandas as pd

    a = pd.DataFrame({"v": [0.1 + 0.2]})
    b = pd.DataFrame({"v": [0.3]})
    assert canonical_rows(a) != canonical_rows(b)  # repr keeps full precision
