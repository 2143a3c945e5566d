"""Window functions + sort/top-k (SURVEY.md §2.5, §2.6).

Window functions shuffle once on the partition key and sort within
partitions — at 100 TB the key choice dominates: all windows here
partition on a high-cardinality key (custkey/user_id) so no single
partition explodes.  Global top-k deliberately uses the
``orderBy().limit()`` shape so the planner emits TakeOrderedAndProject
(per-partition heap + driver merge of k rows, never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from processor_spark.registry import register
from processor_spark.sources import load


@register(
    "q_window_rank",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer top-3 orders by value (row_number, deterministic tie-break)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q_window_lag",
    sql="""
    SELECT user_id, event_id, event_type,
           round(coalesce(epoch(ts - lag(ts) OVER w), -1.0), 3) AS secs_since_prev,
           lag(event_type) OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user deltas between consecutive events (lag + event-time arithmetic)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.round(
            F.coalesce(
                (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)) / 1e6,
                F.lit(-1.0),
            ),
            3,
        ).alias("secs_since_prev"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


@register(
    "q_window_running",
    sql="""
    SELECT user_id, event_id, ts,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 3) AS running_value,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg_4
    FROM events
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + 4-row moving average with explicit ROWS frames."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 3
        ).alias("running_value"),
        F.round(F.avg("value").over(w.rowsBetween(-3, 0)), 4).alias("moving_avg_4"),
    )


@register(
    "q_window_share",
    sql="""
    SELECT o_orderkey, o_custkey,
           round(o_totalprice / sum(o_totalprice) OVER (PARTITION BY o_custkey), 6)
             AS share_of_customer
    FROM orders
    """,
)
def q_window_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-group: order value as share of the customer's total."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") / F.sum("o_totalprice").over(w), 6).alias(
            "share_of_customer"
        ),
    )


@register(
    "q_window_ntile",
    sql="""
    SELECT o_orderkey,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over a global ordering.

    NOTE: unpartitioned window = single-task sort; acceptable for a
    declared demo query, but at 100 TB this shape must be rewritten as
    a quantile-sketch bucketing (see q_percentiles) — documented here
    deliberately.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q_topn",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25 orders → TakeOrderedAndProject (no full sort at scale)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q_sort_multi",
    sql="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier
    ORDER BY s_nationkey ASC NULLS FIRST, s_acctbal DESC NULLS LAST, s_suppkey
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering (range-partitioned sort)."""
    s = load(spark, sf_dir, "supplier")
    return s.orderBy(
        F.asc_nulls_first("s_nationkey"),
        F.desc_nulls_last("s_acctbal"),
        F.asc("s_suppkey"),
    ).select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")


@register(
    "q_window_range",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS n_similar_cheaper,
           round(sum(o_totalprice) OVER (
                          PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000.0 PRECEDING AND 10000.0 FOLLOWING), 2) AS band_total
    FROM orders
    """,
)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames (value-based, not row-based): per customer, orders
    within a ±10k price band of each row.  Range frames require a
    single numeric ordering key in both engines."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w.rangeBetween(-10000, 0)).alias("n_similar_cheaper"),
        F.round(
            F.sum("o_totalprice").over(w.rangeBetween(-10000, 10000)), 2
        ).alias("band_total"),
    )
