"""Projection / filter / conditional / distinct (SURVEY.md §2.2).

All pure narrow transformations: no shuffle except distinct (hash
partial-agg on both sides of one exchange — Catalyst's 2-phase
HashAggregate makes the pre-shuffle side do map-side dedup, so the
exchange carries only distinct keys even at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_spark.registry import register
from processor_spark.sources import load


@register(
    "q_project",
    sql="""
    SELECT
      o_orderkey,
      o_custkey,
      round(o_totalprice * 1.07, 2)                         AS price_with_vat,
      upper(o_orderstatus)                                  AS status_uc,
      year(o_orderdate)                                     AS order_year,
      concat(o_orderpriority, ':', o_orderstatus)           AS prio_tag
    FROM orders
    """,
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed columns, aliasing, expression mix."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 1.07, 2).alias("price_with_vat"),
        F.upper("o_orderstatus").alias("status_uc"),
        F.year("o_orderdate").alias("order_year"),
        F.concat_ws(":", "o_orderpriority", "o_orderstatus").alias("prio_tag"),
    )


@register(
    "q_filter",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('F', 'P') OR o_orderpriority LIKE '1-%')
      AND o_totalprice BETWEEN 50000.0 AND 200000.0
      AND NOT (o_orderstatus = 'P' AND o_totalprice < 100000.0)
      AND o_custkey IS NOT NULL
    """,
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: AND/OR/NOT, IN, BETWEEN, LIKE, IS NULL."""
    o = load(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderstatus").isin("F", "P") | F.col("o_orderpriority").like("1-%"))
        & F.col("o_totalprice").between(50000.0, 200000.0)
        & ~((F.col("o_orderstatus") == "P") & (F.col("o_totalprice") < 100000.0))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "q_case_when",
    sql="""
    SELECT
      o_orderkey,
      CASE
        WHEN o_totalprice >= 300000.0 THEN 'jumbo'
        WHEN o_totalprice >= 150000.0 THEN 'large'
        WHEN o_totalprice >=  50000.0 THEN 'medium'
        ELSE 'small'
      END AS size_bucket,
      CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END AS open_value
    FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expression (searched CASE, nested fallthrough)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000.0, "jumbo")
        .when(F.col("o_totalprice") >= 150000.0, "large")
        .when(F.col("o_totalprice") >= 50000.0, "medium")
        .otherwise("small")
        .alias("size_bucket"),
        F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))
        .otherwise(F.lit(0.0))
        .alias("open_value"),
    )


@register(
    "q_distinct",
    sql="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey
    FROM lineitem
    """,
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate elimination on a column subset (map-side partial dedup)."""
    return load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_suppkey"
    ).distinct()


@register(
    "q_sql_grouping_sets",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def q_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL entry point (SURVEY.md §3 EP2).

    Arbitrary (non-rollup, non-cube) grouping sets have no DataFrame
    API; this exercises the second engine entry point — temp view +
    spark.sql text — which parses to the exact same logical plan class
    (one Expand + one aggregate pass over the fact, not two scans).
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )
