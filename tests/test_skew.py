"""Salted-join balance + equivalence (SCALE.md 'Joins')."""

from __future__ import annotations

from pyspark.sql import functions as F

from processor_spark.operators.skew import salted_join


def _skewed(spark, n=200_000, hot_frac=0.9):
    """90% of rows share one key — the pathological join input."""
    df = spark.range(n).withColumn(
        "k", F.when(F.rand(seed=7) < hot_frac, F.lit(0)).otherwise((F.col("id") % 1000) + 1)
    )
    return df.select(F.col("id").alias("row_id"), "k")


def test_salted_join_matches_plain_join(spark):
    left = _skewed(spark)
    right = spark.range(1001).select(F.col("id").alias("k"), (F.col("id") * 10).alias("payload"))
    plain = left.join(right, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    salted = salted_join(left, right, key="k", salt_src="row_id", n_salts=8)
    got = salted.groupBy().agg(F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"))
    assert plain.first() == got.first()


def test_salting_spreads_the_hot_key(spark):
    left = _skewed(spark)
    salted = left.withColumn("_salt", F.pmod(F.xxhash64("row_id"), F.lit(8)).cast("int"))
    hot = salted.where(F.col("k") == 0)
    sizes = [r.n for r in hot.groupBy("_salt").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert len(sizes) == 8, "hot key must occupy all salt buckets"
    assert max(sizes) < 2 * min(sizes), f"salts unbalanced: {sizes}"
