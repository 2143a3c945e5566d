"""Scans & sources (SURVEY.md §2.1).

Scale notes: both queries rely on Catalyst pushing projection and
predicates into the vectorized Parquet reader — at 100 TB the pruned
scan reads only the referenced column chunks and skips row groups via
min/max stats.  tests/test_plans.py asserts PushedFilters/ReadSchema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_spark.registry import register
from processor_spark.sources import load


@register(
    "q_scan_parquet",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
    FROM lineitem
    """,
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan with schema projection (column pruning reaches the reader)."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate"
    )


@register(
    "q_scan_pruned",
    sql="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_quantity > 30.0
    """,
)
def q_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-pushed + column-pruned scan.

    The two range predicates and the quantity filter all appear as
    PushedFilters on the Parquet scan node; ReadSchema carries only the
    four referenced columns.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("l_quantity") > 30.0)
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")
