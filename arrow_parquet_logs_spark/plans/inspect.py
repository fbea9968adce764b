"""Physical-plan inspection helpers.

"Would this plan survive a 100× scale-up?" is checked mechanically: tests
assert that filters reached the parquet scan (PushedFilters), that projection
pruned the read schema (ReadSchema), and that dimension joins went broadcast
— the three properties that dominate scan-heavy cost at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    plan = explain_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(pushed)
    assert pushed, f"no PushedFilters in plan:\n{plan}"
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed; PushedFilters lines:\n{joined}\n\nfull plan:\n{plan}"


def assert_broadcast(df: DataFrame, n_at_least: int = 1) -> None:
    plan = explain_str(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= n_at_least, f"expected ≥{n_at_least} BroadcastHashJoin, found {n}:\n{plan}"
