"""Skew mitigation utilities (SURVEY.md §4 'skew handling').

AQE's skew-join split handles most skew automatically (enabled in the
session builder), but it only triggers for sort-merge joins above
size thresholds.  ``salted_join`` is the manual fallback for the
pathological case — a hot key whose rows exceed one executor's memory:

  left side:  salt = hash(row-unique col) % S  → hot key spread over S partitions
  right side: replicated S times (one copy per salt value)
  join on (key, salt) — perfectly balanced at the cost of an S×
  replication of the (small) right side.

This is the standard salting recipe; S trades balance against
replication and should be ~(hot-key rows / target partition rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from processor_spark.registry import register
from processor_spark.sources import load


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left ⋈ right on key`` with the left side salted.

    ``salt_src`` is any left column unique-ish per row (an id) used to
    derive a deterministic salt — deterministic so retries and oracle
    comparisons see identical placement (rand() would break both).
    The right side is exploded ×``n_salts``; keep it the small side.
    """
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).cast("int")
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_left.join(salted_right, [key, "_salt"], how)
    return out.drop("_salt")


@register(
    "q_skew_join",
    sql="""
    SELECT l.l_returnflag, count(*) AS n, round(sum(l.l_extendedprice), 2) AS total
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_returnflag
    """,
)
def q_skew_join(spark, sf_dir: str) -> DataFrame:
    """The salted join under oracle check: lineitem⋈orders via
    salted_join must produce exactly the plain join's result (salting
    is a physical rewrite, not a semantic one)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    joined = salted_join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        o,
        key="o_orderkey",
        salt_src="l_linenumber",
        n_salts=4,
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
    )
