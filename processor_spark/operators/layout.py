"""Data-layout operators: z-order clustering and compaction planning.

The two biggest storage-side cost levers on a 100 TB lake after
partitioning (SURVEY.md §2 scale goals):

- **Z-ordering** interleaves the bits of two scan dimensions so that
  sorting by the single z-value co-locates rows that are close in BOTH
  dimensions — per-file min/max ranges become narrow on every z-ordered
  column and row-group skipping works for predicates on either one.
  Here the interleave is exact integer bit math (16 bits per
  dimension), so the DuckDB oracle replays it bit-for-bit.
- **Compaction planning** turns a small-files problem into a list of
  merge jobs: within each partition, order files and greedily pack
  cumulative size into target-sized groups.  The greedy pack is a
  running-sum window *per partition* — never a global sort — which is
  the shape that scales: a table with 1 M partitions plans in one
  window stage.

Plan shape notes: q_zorder_layout is scan → narrow projection (the bit
interleave folds into one codegen stage) → one hash aggregate on the
bucket id.  q_compaction_plan is two hash aggregates plus one
partition-local window — all keyed on the partition column, so AQE can
coalesce freely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from processor_spark.registry import register
from processor_spark.sources import load

# aggregate(sequence(0,15), ...) interleaves bit b of x into z-bit 2b
# and bit b of y into z-bit 2b+1 — a 32-bit Morton code from two
# 16-bit dimensions, in one whole-stage-codegen expression (no UDF).
_Z_EXPR = (
    "aggregate(sequence(0, 15), 0L, (acc, b) -> acc"
    " + shiftleft(CAST(shiftright(zx, b) & 1 AS BIGINT), 2 * b)"
    " + shiftleft(CAST(shiftright(zy, b) & 1 AS BIGINT), 2 * b + 1))"
)


@register(
    "q_zorder_layout",
    sql="""
    WITH pts AS (
      SELECT o_custkey % 65536 AS zx,
             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) % 65536 AS zy
      FROM orders
    ), z AS (
      SELECT zx, zy,
             list_sum(list_transform(range(0, 16),
               b -> (((zx >> b) & 1) << (2 * b)) + (((zy >> b) & 1) << (2 * b + 1)))) AS zval
      FROM pts
    )
    SELECT CAST(zval // 4194304 AS BIGINT) AS z_bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(zx) AS BIGINT) AS min_cust,
           CAST(max(zx) AS BIGINT) AS max_cust,
           CAST(min(zy) AS BIGINT) AS min_day,
           CAST(max(zy) AS BIGINT) AS max_day
    FROM z
    GROUP BY 1
    """,
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-code) clustering of orders on (custkey, orderdate):
    interleave 16 bits of each dimension into one z-value, bucket rows by
    z-range (the stand-in for "file" assignment under a z-ordered
    rewrite), and report per-bucket min/max of BOTH dimensions — the
    per-file stats a reader's row-group skipping would consult.  Narrow
    ranges in both columns are the whole point of z-ordering; a linear
    sort on custkey would leave the date ranges full-width.  Exact
    integer bit math end-to-end, so the oracle replays the interleave
    bit-for-bit."""
    o = load(spark, sf_dir, "orders")
    pts = o.select(
        (F.col("o_custkey") % 65536).alias("zx"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            % 65536
        ).alias("zy"),
    )
    z = pts.withColumn("zval", F.expr(_Z_EXPR))
    return (
        z.groupBy(F.expr("zval div 4194304").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zx").alias("min_cust"),
            F.max("zx").alias("max_cust"),
            F.min("zy").alias("min_day"),
            F.max("zy").alias("max_day"),
        )
    )


@register(
    "q_compaction_plan",
    sql="""
    WITH files AS (
      SELECT date_trunc('month', o_orderdate) AS part_month,
             CAST(o_orderdate AS DATE) AS file_day,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS file_bytes
      FROM orders
      GROUP BY 1, 2
    ), packed AS (
      SELECT part_month, file_day, n_rows, file_bytes,
             CAST(sum(file_bytes) OVER (PARTITION BY part_month ORDER BY file_day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) AS bytes_before
      FROM files
    )
    SELECT strftime(part_month, '%Y-%m') AS part_month,
           CAST(COALESCE(bytes_before, 0) // 200000000 AS BIGINT) AS merge_group,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_rows) AS BIGINT) AS group_rows,
           CAST(sum(file_bytes) AS BIGINT) AS group_bytes,
           CAST(min(file_day) AS VARCHAR) AS first_file,
           CAST(max(file_day) AS VARCHAR) AS last_file
    FROM packed
    GROUP BY 1, 2
    """,
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction planner: model one "file" per order-day
    (size = exact integer cents of that day's totalprice — a
    deterministic stand-in for bytes), then within each month-partition
    greedily pack files in day order into ~2 GB merge groups
    (group = running-size-before div target).  Emits one row per
    planned merge job with its file count, size, and day span.  The
    running sum is a window per PARTITION — compaction never crosses
    partition boundaries, so there is no global sort and a million
    partitions plan in one stage.  All-integer arithmetic; dates
    stringified for the cross-engine hash (CLAUDE.md bridge)."""
    o = load(spark, sf_dir, "orders")
    files = (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").alias("part_month"),
            F.col("o_orderdate").cast("date").alias("file_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias(
                "file_bytes"
            ),
        )
    )
    w = (
        Window.partitionBy("part_month")
        .orderBy("file_day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        files.withColumn("bytes_before", F.sum("file_bytes").over(w))
        .withColumn("merge_group", F.expr("coalesce(bytes_before, 0L) div 200000000"))
    )
    return (
        packed.groupBy(
            F.date_format("part_month", "yyyy-MM").alias("part_month"), "merge_group"
        )
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").alias("group_rows"),
            F.sum("file_bytes").alias("group_bytes"),
            F.min(F.col("file_day").cast("string")).alias("first_file"),
            F.max(F.col("file_day").cast("string")).alias("last_file"),
        )
    )
