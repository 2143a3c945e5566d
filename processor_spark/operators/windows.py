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

from processor_spark.caching import scoped_persist
from processor_spark.registry import register
from processor_spark.sources import load


def distributed_rank(df: DataFrame, order_cols: list) -> DataFrame:
    """Global ``row_number`` under a total order with NO single-task
    sort — the scale-safe replacement for ``Window.orderBy(...)`` with
    an empty partition spec (the canonical global-window anti-pattern:
    every row coalesces into ONE task).

    Range-partition on the order keys (disjoint ordered ranges across
    tasks), rank locally within each partition in parallel, then add
    the exclusive prefix sum of per-partition row counts — a
    partition-count-sized table (bytes) that BROADCASTs back.  The
    result is identical for ANY range boundaries, so sampling
    nondeterminism in the range partitioner cannot change the answer;
    ``order_cols`` must therefore be a TOTAL order (include a unique
    tie-break key).

    Adds ``__rank`` (1-based global position, bigint) and ``__n``
    (total row count) to ``df``.  The ranged stream is scoped-persisted
    because both the offsets agg and the main stream read it.
    """
    nparts = max(2, df.sparkSession.sparkContext.defaultParallelism // 2)
    ranged = scoped_persist(
        df.repartitionByRange(nparts, *order_cols).withColumn(
            "pid", F.spark_partition_id()
        )
    )
    w_ord = Window.orderBy("pid")  # over ~nparts aggregated rows — bytes
    offsets = (
        ranged.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("cnt").over(w_ord.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "__n",
            F.sum("cnt").over(
                w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        )
        .select("pid", "offset", "__n")
    )
    local = Window.partitionBy("pid").orderBy(*order_cols)
    return (
        ranged.withColumn("local_rn", F.row_number().over(local))
        .join(F.broadcast(offsets), "pid")
        .withColumn("__rank", F.col("offset") + F.col("local_rn"))
        .drop("pid", "local_rn", "offset")
    )


def ntile_expr(rank: str, n: str, k: int) -> str:
    """SQL expression computing ``ntile(k)`` from a global 1-based rank
    under a total order: the first ``n % k`` buckets take
    ``n div k + 1`` rows, the rest ``n div k`` — exactly the SQL-window
    ntile semantics, as pure integer arithmetic (engine-exact).  The
    ELSE branch's ``div`` by ``n div k`` is only reached when
    ``n >= k`` (when ``n < k`` the cut covers every row), so it never
    divides by zero."""
    base = f"({n} div {k})"
    rem = f"({n} % {k})"
    cut = f"(({base} + 1) * {rem})"
    return (
        f"CASE WHEN {rank} <= {cut} THEN ({rank} - 1) div ({base} + 1) + 1 "
        f"ELSE {rem} + ({rank} - {cut} - 1) div {base} + 1 END"
    )


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
    """ntile / percent_rank / cume_dist over a global ordering —
    computed WITHOUT an unpartitioned window (VERDICT r4 #1: the old
    ``Window.orderBy`` form pushed the whole table through one task).

    ``distributed_rank`` range-partitions and ranks in parallel; under
    a total order (price, orderkey) the three analytics are pure
    functions of (rank, n): ntile(4) is integer bucket arithmetic,
    percent_rank = (rank-1)/(n-1), cume_dist = rank/n — the exact
    definitions the window functions evaluate, so the same doubles
    round to the same outputs on both engines.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    r = distributed_rank(o, [F.asc("o_totalprice"), F.asc("o_orderkey")])
    pct = F.when(
        F.col("__n") > 1,
        (F.col("__rank") - 1).cast("double") / (F.col("__n") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    return r.select(
        "o_orderkey",
        F.expr(ntile_expr("__rank", "__n", 4)).cast("int").alias("quartile"),
        F.round(pct, 6).alias("pct_rank"),
        F.round(F.col("__rank").cast("double") / F.col("__n").cast("double"), 6).alias(
            "cume"
        ),
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
