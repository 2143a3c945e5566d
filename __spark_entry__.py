"""Driver contract for the spark-graft builder (PySpark target).

Thin view over processor_spark.registry — every operator from
SURVEY.md §2 registers its PySpark builder and (when SQL-expressible)
its DuckDB oracle SQL in one place; see processor_spark/operators/*
and processor_spark/functions/families.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from processor_spark import registry
from processor_spark.registry import get


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q_join_5way: 5-way star join (customer⋈orders⋈lineitem⋈nation⋈region)
    with broadcast dims + grouped revenue agg — SURVEY.md §5 item 2.
    """
    return get("q_join_5way").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return registry.oracle_sql()
