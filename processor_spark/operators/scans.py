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


def _orc_copy(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a 2-column lineitem projection as ORC (once per
    sf_dir; _SUCCESS marker makes re-use cheap across sessions) so the
    ORC read path is exercised against real data."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/processor_spark_orc/{tag}/lineitem"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_extendedprice")
            .write.mode("overwrite")
            .orc(path)
        )
    return path


@register(
    "q_scan_orc",
    sql="""
    SELECT l_returnflag, count(*) AS n_rows,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source path (SURVEY.md §2.1's 'other columnar lake
    format'): lineitem is round-tripped through an ORC layout and
    aggregated from the ORC scan — same vectorized-reader /
    predicate-pushdown machinery as parquet, verified by oracling the
    aggregate against the ORIGINAL parquet table (identical rows by
    construction, exact integer cents so the sum is order-free)."""
    path = _orc_copy(spark, sf_dir)
    df = spark.read.orc(path)
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("revenue_cents"),
    )
