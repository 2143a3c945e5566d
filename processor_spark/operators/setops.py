"""Set operations (SURVEY.md §2.7).

unionByName is a zero-shuffle concatenation; INTERSECT/EXCEPT compile
to aggregate+join under Catalyst (shuffle on the full row as key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_spark.registry import register
from processor_spark.sources import load


def _buyers_sellers(spark: SparkSession, sf_dir: str):
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c, s


@register(
    "q_union",
    sql="""
    SELECT nationkey, count(*) AS n
    FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by name + count per key (tests column alignment)."""
    c, s = _buyers_sellers(spark, sf_dir)
    return c.unionByName(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_intersect",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): nations having both customers and suppliers."""
    c, s = _buyers_sellers(spark, sf_dir)
    return c.intersect(s)


@register(
    "q_except",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): nations with customers but no suppliers."""
    c, s = _buyers_sellers(spark, sf_dir)
    return c.subtract(s)


@register(
    "q_except_all",
    sql="""
    SELECT nationkey, count(*) AS surplus
    FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): per nation, how many MORE customers
    than suppliers — multiplicity is the answer, which set-EXCEPT
    destroys.  Catalyst plans ExceptAll as a count-difference
    aggregate + replicate, not a pairwise anti join, so it stays one
    shuffle at scale; the per-key count output keeps the oracle
    comparison compact."""
    c, s = _buyers_sellers(spark, sf_dir)
    return c.exceptAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("surplus"))


@register(
    "q_intersect_all",
    sql="""
    SELECT nationkey, count(*) AS n_matched
    FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): per nation, min(customer count,
    supplier count) occurrences survive — the multiplicity-aware
    intersection."""
    c, s = _buyers_sellers(spark, sf_dir)
    return c.intersectAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n_matched"))
