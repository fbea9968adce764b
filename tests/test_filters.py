"""Property-based check of the filter-triple compiler against a pandas
re-implementation (SURVEY.md §5 item 5): random triples over the events
table must select exactly the same rows in Spark and pandas."""

from __future__ import annotations

import operator

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from arrow_parquet_logs_spark.logstore.filters import FilterError, compile_filter, compile_filters

_PD_OPS = {
    ">=": operator.ge,
    "<=": operator.le,
    "==": operator.eq,
    "=": operator.eq,
    "!=": operator.ne,
    ">": operator.gt,
    "<": operator.lt,
}

_COLS = {
    "event_id": st.integers(0, 1000),
    "value": st.floats(0, 400, allow_nan=False).map(lambda v: round(v, 2)),
    "event_type": st.sampled_from(["error", "view", "click", "purchase", "signup"]),
}


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    sdf = spark.read.parquet(f"{sf_dir}/events.parquet").drop("ts").limit(500).cache()
    return sdf, sdf.toPandas()


@st.composite
def triples(draw):
    n = draw(st.integers(1, 3))
    out = []
    for _ in range(n):
        col = draw(st.sampled_from(sorted(_COLS)))
        op = draw(st.sampled_from(sorted(_PD_OPS)))
        out.append((col, op, draw(_COLS[col])))
    return out


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ts=triples())
def test_compiler_matches_pandas(frames, ts):
    sdf, pdf = frames
    got = sorted(r.event_id for r in sdf.where(compile_filters(ts)).select("event_id").collect())
    mask = pd.Series(True, index=pdf.index)
    for col, op, val in ts:
        mask &= _PD_OPS[op](pdf[col], val)
    expected = sorted(pdf.loc[mask, "event_id"])
    assert got == expected


def test_unknown_and_malformed_triples_raise():
    for bad in [("c", "~", 1), ("c", "between", (1, 2)), ("c",), (1, "==", 2), ("c", "==", 1, 4)]:
        with pytest.raises(FilterError):
            compile_filter(bad)


def test_extended_ops(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5), (3, "abc", 7)], "id long, s string, v long"
    )
    cases = [
        ([("s", "in", ["a", "b"])], [1, 2]),
        ([("s", "not in", ["a"])], [2, 3]),
        ([("v", "is null")], [1]),
        ([("v", "is not null")], [2, 3]),
        ([("s", "like", "a%")], [1, 3]),
        ([("s", "rlike", "^ab")], [3]),
        ([], [1, 2, 3]),  # empty conjunction = true
    ]
    for fs, expected in cases:
        got = sorted(r.id for r in df.where(compile_filters(fs)).collect())
        assert got == expected, fs
