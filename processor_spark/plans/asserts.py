"""Plan-shape assertion helpers (SURVEY.md §4, §5 item 6).

The §4 table claims most optimizations are "free" from Catalyst; these
helpers turn each claim into a test: broadcast chosen for dims, filters
pushed into the Parquet scan, TakeOrdered for top-k, whole-stage
codegen spans present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def assert_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = explain_str(df, mode)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in plan:\n{plan}"
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = explain_str(df, mode)
    for needle in needles:
        assert needle not in plan, f"did not expect {needle!r} in plan:\n{plan}"
    return plan
