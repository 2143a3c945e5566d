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


@register(
    "q_skew_profile",
    sql="""
    WITH per_key AS (
      SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY l_orderkey
    )
    SELECT count(*) AS n_keys,
           CAST(min(cnt) AS BIGINT) AS min_per_key,
           CAST(max(cnt) AS BIGINT) AS max_per_key,
           round(avg(cnt), 6) AS avg_per_key,
           round(max(cnt) / avg(cnt), 6) AS skew_factor,
           round(max(cnt) / sum(cnt), 9) AS top_key_share
    FROM per_key
    """,
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics: the pre-flight profile you run BEFORE
    shuffling 100 TB on a key — per-key cardinality summarized as
    min/max/avg, the max/avg skew factor (how much hotter the hottest
    task runs than the average), and the hottest key's share of all
    rows (what fraction of the table one task would own).

    Two map-side-combinable aggs back to back; cost is one pass over
    the key column. A skew_factor ≫ 10 is the signal to salt the key
    or rely on AQE skew-join splitting (see q_skew_join for the cure;
    this operator is the diagnosis).
    """
    l = load(spark, sf_dir, "lineitem")
    per_key = l.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.min("cnt").alias("min_per_key"),
        F.max("cnt").alias("max_per_key"),
        F.round(F.avg("cnt"), 6).alias("avg_per_key"),
        F.round(F.max("cnt") / F.avg("cnt"), 6).alias("skew_factor"),
        F.round(F.max("cnt") / F.sum("cnt"), 9).alias("top_key_share"),
    )
