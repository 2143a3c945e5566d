"""Aggregation operators (SURVEY.md §2.4).

All grouped aggregates get Catalyst's 2-phase HashAggregate for free:
partial (map-side) agg before the shuffle, final after — the exchange
carries one row per (partition, group), not per input row.  Float sums
are rounded identically on both engine and oracle sides because
addition order across partitions is nondeterministic (SURVEY.md §7
watch list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_spark.registry import register
from processor_spark.sources import load


@register(
    "q_pricing_summary",
    sql="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 2)                                          AS sum_qty,
      round(sum(l_extendedprice), 2)                                     AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
      round(avg(l_quantity), 4)                                          AS avg_qty,
      round(avg(l_extendedprice), 4)                                     AS avg_price,
      round(avg(l_discount), 6)                                          AS avg_disc,
      count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shape pricing summary: grouped sum/avg/count with computed measures."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_agg_distinct",
    sql="""
    SELECT
      l_returnflag,
      count(DISTINCT l_suppkey)            AS n_suppliers,
      count(DISTINCT l_partkey)            AS n_parts,
      round(sum(DISTINCT l_quantity), 2)   AS sum_distinct_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct)/sum(distinct) — Catalyst expands to a 2-level agg."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_distinct_qty"),
    )


@register("q_agg_approx", sql=None)  # approximate: value differs from exact → rows-only
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate count-distinct per return flag.

    At 100 TB this replaces exact countDistinct when a ~1% error is
    acceptable: one pass, constant memory per group, no key explosion.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", 0.02).alias("approx_suppliers"),
    )


@register(
    "q_agg_filtered",
    sql="""
    SELECT
      o_orderpriority,
      count(*)                                                        AS n_orders,
      count(*) FILTER (WHERE o_orderstatus = 'F')                     AS n_finished,
      round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2)  AS open_value,
      round(avg(CASE WHEN o_totalprice > 100000.0 THEN o_totalprice END), 4) AS avg_big
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregates via conditional projection (FILTER/CASE equivalent)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))), 2
        ).alias("open_value"),
        F.round(
            F.avg(F.when(F.col("o_totalprice") > 100000.0, F.col("o_totalprice"))), 4
        ).alias("avg_big"),
    )


@register(
    "q_grouping_sets",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_value
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: (status, priority) → (status) → () subtotal hierarchy."""
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_value"),
    )


@register(
    "q_cube",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders, round(avg(o_totalprice), 4) AS avg_value
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping-set combinations in one pass (Expand operator)."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_value"),
    )


@register(
    "q_agg_having",
    sql="""
    SELECT l_suppkey, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING count(*) > 100 AND sum(l_quantity) > 2000.0
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING) — filter applied above the final agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("_raw_qty"),
        )
        .where((F.col("n_items") > 100) & (F.col("_raw_qty") > 2000.0))
        .select("l_suppkey", "n_items", F.round("_raw_qty", 2).alias("total_qty"))
    )


@register(
    "q_agg_collect",
    sql="""
    SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array agg per group, sorted for order-canonical hashing.

    Serialized to a CSV string on BOTH sides: the driver's value-hash
    canonicalization can't hash list cells (ADVICE r1)."""
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@register("q_percentiles", sql=None)  # interpolation conventions differ → rows-only
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median + p90/p99 of order value per priority (percentile_approx).

    approx percentile = one-pass QuantileSummaries sketch, mergeable
    across partitions — the 100 TB-safe way to get quantiles without a
    global sort.
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile_approx("o_totalprice", 0.5, 10000), 2).alias("p50"),
        F.round(F.percentile_approx("o_totalprice", 0.9, 10000), 2).alias("p90"),
        F.round(F.percentile_approx("o_totalprice", 0.99, 10000), 2).alias("p99"),
    )


@register(
    "q_grouping_id",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER)   AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           count(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() indicators — the canonical way to tell a
    subtotal row's NULL from a genuine NULL group value."""
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register("q_hll_sketch", sql=None)  # sketch bytes are engine-specific → rows-only
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, Spark 4 built-ins):
    per-nation customer sketches unioned into a per-region distinct
    estimate WITHOUT re-scanning — the pre-aggregated-rollup pattern
    that makes 100 TB distinct-count dashboards cheap (store sketch
    bytes per fine grain, union at query time)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    per_nation = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sketch")
    )
    joined = per_nation.join(
        F.broadcast(n), per_nation.c_nationkey == n.n_nationkey
    )
    return (
        joined.groupBy("n_regionkey")
        .agg(F.hll_union_agg("sketch").alias("region_sketch"))
        .select(
            "n_regionkey",
            F.hll_sketch_estimate("region_sketch").alias("approx_customers"),
        )
    )


@register(
    "q_median",
    sql="""
    SELECT o_orderpriority,
           round(median(o_totalprice), 4) AS median_price,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median per priority (both engines interpolate even-count
    groups identically — verified at sf0.001/sf0.01, so this carries a
    full hash oracle unlike the sketch-based q_percentiles).  Exact
    medians need the group sorted — fine per-group here; at extreme
    group sizes prefer the q_percentiles sketch."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 4).alias("median_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q_agg_bool",
    sql="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000.0)                    AS all_over_1k,
           bool_or(o_orderpriority = '1-URGENT')              AS any_urgent,
           CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
           CAST(count_if(o_totalprice > 200000.0) AS BIGINT)  AS n_big
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family: bool_and / bool_or /
    count_if per group — all partial-aggregable (map-side combine),
    so the shuffle carries one row per (partition, group)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        F.count_if(F.col("o_totalprice") > 200000.0).alias("n_big"),
    )


@register(
    "q_mode",
    sql="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_count
    FROM (
      SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY count(*) DESC, o_orderpriority) AS rn
      FROM orders GROUP BY 1, 2
    ) WHERE rn = 1
    """,
)
def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value) per group: counted,
    then row_number with an explicit (count DESC, value ASC)
    tie-break — F.mode exists in Spark 4 but leaves ties
    engine-defined, so the portable form is count + top-1.  Two-phase
    hash agg shrinks the input to |statuses x priorities| rows before
    the window, so the sort is over a constant-size relation at any
    scale."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    counted = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("cnt"), F.asc("o_orderpriority"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").alias("mode_count"),
        )
    )


@register(
    "q_agg_weighted",
    sql="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
           round(sum(l_quantity), 2) AS total_weight,
           round(pow(sum(l_quantity), 2) / sum(l_quantity * l_quantity), 4) AS eff_n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted aggregates per return flag: quantity-weighted mean
    price plus Kish effective sample size (sum w)^2 / sum(w^2) — the
    survey-statistics building blocks, expressed as plain sum
    combinations so Catalyst keeps everything in one partial+final
    hash agg (fully mergeable at 100 TB; no window, no second pass)."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity")) / F.sum("l_quantity"), 4
        ).alias("wavg_price"),
        F.round(F.sum("l_quantity"), 2).alias("total_weight"),
        F.round(
            F.pow(F.sum("l_quantity"), F.lit(2))
            / F.sum(F.col("l_quantity") * F.col("l_quantity")),
            4,
        ).alias("eff_n"),
    )


@register(
    "q_percentile_cont",
    sql="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles (type-7, position p*(n-1)) per
    priority — Spark `percentile` and DuckDB `quantile_cont` share the
    definition, and interpolation weights of .25/.75/.9 on 2-dp prices
    yield <= 4-dp exact decimals, so round(.,4) is divergence-free
    (same bridge as q_median).  Exact percentiles sort per group; the
    sketch-based q_percentiles is the 100 TB default, this is the
    small-group exact path."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
        F.round(F.expr("percentile(o_totalprice, 0.90)"), 4).alias("p90"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q_incremental_agg",
    sql="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the orders table is
    split into a 'base' partition (orderdate < 1997-07-01, the
    yesterday's-rollup stand-in) and a 'delta' (newer rows); each side
    is aggregated to PARTIAL states (count/sum/min/max) independently
    and the partials are merged by a second agg — count+=count,
    sum+=sum, min=min, max=max.  The oracle is the direct full-table
    aggregate: merged partials must equal a from-scratch run, which is
    exactly the mergeability contract that lets a 100 TB rollup absorb
    a daily delta without rescanning history."""
    o = load(spark, sf_dir, "orders")
    cut = F.lit("1997-07-01").cast("date")

    def partial(side: DataFrame) -> DataFrame:
        return side.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("s"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )

    base = partial(o.where(F.col("o_orderdate") < cut))
    delta = partial(o.where(F.col("o_orderdate") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n_orders"),
            F.round(F.sum("s"), 2).alias("total"),
            F.round(F.min("mn"), 2).alias("lo"),
            F.round(F.max("mx"), 2).alias("hi"),
        )
    )


@register(
    "q_percentile_disc",
    sql="""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*)   OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           min(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN o_totalprice END) AS p50_disc,
           min(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN o_totalprice END) AS p90_disc,
           min(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN o_totalprice END) AS p99_disc
    FROM ranked
    GROUP BY o_orderpriority
    """,
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete percentiles (the value AT position ceil(p*n), no
    interpolation) per priority — identical-by-construction on both
    engines: the selection rule is spelled out as row_number =
    ceil(p*n) with a deterministic tie-break, so no engine's
    percentile_disc convention is involved, and the output is a raw
    data value (no float arithmetic to round).

    Scale shape: one shuffle on the group key, one sort per group —
    same cost as any windowed rank; for percentiles over billions of
    rows per group use q_percentiles (mergeable sketch) instead.
    """
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(p: float, name: str):
        return F.min(
            F.when(F.col("rn") == F.ceil(p * F.col("n")).cast("bigint"), F.col("o_totalprice"))
        ).alias(name)

    return ranked.groupBy("o_orderpriority").agg(
        pick(0.50, "p50_disc"), pick(0.90, "p90_disc"), pick(0.99, "p99_disc")
    )


@register(
    "q_weighted_median",
    sql="""
    WITH g AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_quantity) AS BIGINT) AS qty,
             SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS w
      FROM lineitem
      GROUP BY 1, 2
    ), c AS (
      SELECT flag, qty, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY qty) AS cum,
             SUM(w) OVER (PARTITION BY flag) AS total
      FROM g
    )
    SELECT flag,
           CAST(min(qty) AS BIGINT) AS wmedian_qty,
           CAST(min(total) AS BIGINT) AS total_w_cents
    FROM c
    WHERE 2 * cum >= total
    GROUP BY flag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (lower) of quantity per return flag,
    weighted by integer revenue cents — the robust-statistics twin of
    q_median that percentile_approx cannot answer exactly.

    Scale shape: the fact table collapses FIRST into (flag, quantity)
    cells via one map-side-combinable agg (the value domain, ~50 rows
    per flag — this is the trick: weighted median over 100 TB needs a
    window over the DOMAIN, not the data), then a partition-local
    cumulative sum finds the smallest value whose cumulative weight
    reaches half the total.  All-integer arithmetic end-to-end, so the
    oracle replays the cut bit-free."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    g = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_quantity")).cast("long").alias("qty"),
        )
        .agg(F.sum(cents).alias("w"))
    )
    wc = Window.partitionBy("flag").orderBy("qty").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy("flag")
    c = g.select(
        "flag",
        "qty",
        F.sum("w").over(wc).alias("cum"),
        F.sum("w").over(wt).alias("total"),
    )
    return (
        c.where(2 * F.col("cum") >= F.col("total"))
        .groupBy("flag")
        .agg(
            F.min("qty").alias("wmedian_qty"),
            F.min("total").alias("total_w_cents"),
        )
    )


@register(
    "q_iqr_outliers",
    sql="""
    WITH c AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ), q AS (
      SELECT c_nationkey,
             CAST(floor(quantile_cont(cents, 0.25) * 4 + 0.5) AS BIGINT) AS q1_qc,
             CAST(floor(quantile_cont(cents, 0.75) * 4 + 0.5) AS BIGINT) AS q3_qc,
             count(*) AS n
      FROM c GROUP BY c_nationkey
    )
    SELECT c.c_nationkey, CAST(q.n AS BIGINT) AS n, q.q1_qc, q.q3_qc,
           CAST(count_if(8 * c.cents < 2 * q.q1_qc - 3 * (q.q3_qc - q.q1_qc))
                AS BIGINT) AS n_low,
           CAST(count_if(8 * c.cents > 2 * q.q3_qc + 3 * (q.q3_qc - q.q1_qc))
                AS BIGINT) AS n_high
    FROM c JOIN q USING (c_nationkey)
    GROUP BY c.c_nationkey, q.n, q.q1_qc, q.q3_qc
    """,
)
def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (1.5·IQR) outlier census per nation — the robust
    outlier detector (q_anomaly_zscore's mean/stddev version breaks
    when the outliers themselves inflate sigma; quartiles don't care).
    The whole test is EXACT integer arithmetic: balances become cents,
    type-7 quartiles of integers are quarter-cent rationals recovered
    exactly via floor(x·4+0.5) (the true value IS a quarter-integer,
    so the nearest-integer snap absorbs any last-bit implementation
    difference), and the fence comparison is cross-multiplied to
    eighth-cents — 8·x < 2·q1 − 3·(q3−q1) — so no float fence ever
    crosses the engine boundary.

    Scale shape: two passes over the fact column (exact quantiles per
    group, then the fence count) with the quartile table — one row per
    nation — broadcast back; at 100 TB swap pass 1 to approx_percentile
    (q_percentiles' sketch path) and keep pass 2 unchanged."""
    c = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    q = c.groupBy("c_nationkey").agg(
        F.floor(F.expr("percentile(cents, 0.25)") * 4 + F.lit(0.5))
        .cast("long")
        .alias("q1_qc"),
        F.floor(F.expr("percentile(cents, 0.75)") * 4 + F.lit(0.5))
        .cast("long")
        .alias("q3_qc"),
        F.count(F.lit(1)).alias("n"),
    )
    iqr = F.col("q3_qc") - F.col("q1_qc")
    return (
        c.join(F.broadcast(q), "c_nationkey")
        .groupBy("c_nationkey", "n", "q1_qc", "q3_qc")
        .agg(
            F.count_if(8 * F.col("cents") < 2 * F.col("q1_qc") - 3 * iqr).alias("n_low"),
            F.count_if(8 * F.col("cents") > 2 * F.col("q3_qc") + 3 * iqr).alias("n_high"),
        )
        .select("c_nationkey", "n", "q1_qc", "q3_qc", "n_low", "n_high")
    )


@register(
    "q_decimal_money",
    sql="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS total_str,
           CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS min_str,
           CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS max_str
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL money arithmetic — the fixed-point type path
    (SURVEY.md §1.2) that the engine's integer-cents convention
    otherwise sidesteps: prices become DECIMAL(18,2) and are summed
    EXACTLY (Spark widens to DECIMAL(28,2) partials, DuckDB to
    DECIMAL(38,2) — both lossless, any partition order), then
    stringified so the driver hashes the canonical decimal rendering
    on both engines.  The double→decimal snap is unambiguous because
    the stored doubles sit within 1e-10 of 2-dp values, far from any
    half-cent boundary.

    Scale shape: one map-side-combinable hash agg; decimal partials
    are 128-bit adds — the exactness costs no extra pass.  This is
    what a finance-grade pipeline uses where floats are inadmissible
    evidence."""
    o = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("string").alias("total_str"),
        F.min(dec).cast("string").alias("min_str"),
        F.max(dec).cast("string").alias("max_str"),
    )


@register(
    "q_winsorize",
    sql="""
    WITH c AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ), q AS (
      SELECT c_nationkey,
             CAST(floor(quantile_cont(cents, 0.05) * 4 + 0.5) AS BIGINT) AS p05_qc,
             CAST(floor(quantile_cont(cents, 0.95) * 4 + 0.5) AS BIGINT) AS p95_qc
      FROM c GROUP BY c_nationkey
    ), clamped AS (
      SELECT c.c_nationkey, q.p05_qc, q.p95_qc,
             CASE WHEN 4 * c.cents < q.p05_qc THEN q.p05_qc
                  WHEN 4 * c.cents > q.p95_qc THEN q.p95_qc
                  ELSE 4 * c.cents END AS w_qc,
             CASE WHEN 4 * c.cents < q.p05_qc OR 4 * c.cents > q.p95_qc
                  THEN 1 ELSE 0 END AS clipped
      FROM c JOIN q USING (c_nationkey)
    )
    SELECT c_nationkey,
           count(*) AS n,
           CAST(sum(clipped) AS BIGINT) AS n_clipped,
           CAST(sum(w_qc) AS BIGINT) AS wsum_qc,
           CAST(floor(CAST(sum(w_qc) AS DOUBLE) / count(*) * 250.0 + 0.5) AS BIGINT)
             AS winsor_mean_milli
    FROM clamped
    GROUP BY c_nationkey
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%/95%-clamped) mean per nation — the robust
    location estimate that keeps every row but caps outlier LEVERAGE,
    the standard treatment before averaging heavy-tailed metrics.
    Same exact-integer machinery as q_iqr_outliers: type-7 quantiles
    of integer cents recovered exactly as quarter-cent integers, the
    clamp comparison cross-multiplied (4·cents vs p_qc) so no float
    boundary exists, the clamped sum exact, and the mean emitted in
    milli-cents via one division (×250 = ×1000/4 undoes the
    quarter-cent scale).

    Scale shape: quantile pass + broadcast-back clamp pass — two scans,
    both map-side-combinable; sketch-swap the quantiles at 100 TB."""
    c = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    q = c.groupBy("c_nationkey").agg(
        F.floor(F.expr("percentile(cents, 0.05)") * 4 + F.lit(0.5))
        .cast("long")
        .alias("p05_qc"),
        F.floor(F.expr("percentile(cents, 0.95)") * 4 + F.lit(0.5))
        .cast("long")
        .alias("p95_qc"),
    )
    qc = 4 * F.col("cents")
    clamped = c.join(F.broadcast(q), "c_nationkey").select(
        "c_nationkey",
        F.when(qc < F.col("p05_qc"), F.col("p05_qc"))
        .when(qc > F.col("p95_qc"), F.col("p95_qc"))
        .otherwise(qc)
        .alias("w_qc"),
        F.when((qc < F.col("p05_qc")) | (qc > F.col("p95_qc")), F.lit(1))
        .otherwise(F.lit(0))
        .alias("clipped"),
    )
    return (
        clamped.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("clipped").alias("n_clipped"),
            F.sum("w_qc").alias("wsum_qc"),
        )
        .select(
            "c_nationkey",
            "n",
            "n_clipped",
            "wsum_qc",
            F.floor(
                F.col("wsum_qc").cast("double") / F.col("n") * 250.0 + F.lit(0.5)
            )
            .cast("long")
            .alias("winsor_mean_milli"),
        )
    )


@register(
    "q_feature_scale",
    sql="""
    WITH c AS (
      SELECT c_custkey, c_nationkey,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ), s AS (
      SELECT c_nationkey, count(*) AS n,
             CAST(sum(cents) AS BIGINT) AS sx,
             CAST(sum(cents * cents) AS BIGINT) AS sxx
      FROM c GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_nationkey,
           CAST(floor(
             CAST(s.n * c.cents - s.sx AS DOUBLE)
             / sqrt(CAST(CAST(s.n AS HUGEINT) * s.sxx
                         - CAST(s.sx AS HUGEINT) * s.sx AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS z_micro
    FROM c JOIN s USING (c_nationkey)
    """,
)
def q_feature_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization (StandardScaler) as a PER-ROW
    transform — the feature-prep step before any distance-based model,
    and a representative of the transform-shaped keys (most of the
    registry aggregates; this one emits a scaled fact table).  The
    mean and population σ never materialize: z = (x−μ)/σ rewrites to
    (n·x − Σx) / √(n·Σx² − (Σx)²), every term an exact integer (the
    σ-term product in 128-bit), so the only float ops are one sqrt and
    one division of identical exact integers — IEEE-identical on both
    engines, snapped to micro-units.

    Scale shape: one map-side-combinable moments agg per group, stats
    broadcast back, then a narrow map over the fact — two scans, no
    window, no sort; the transform pipelines into whatever consumes
    it."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    s = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sx"),
        F.sum(F.col("cents") * F.col("cents")).alias("sxx"),
    )
    num = (F.col("n") * F.col("cents") - F.col("sx")).cast("double")
    var_scaled = (
        F.col("n").cast("decimal(20,0)") * F.col("sxx").cast("decimal(20,0)")
        - F.col("sx").cast("decimal(20,0)") * F.col("sx").cast("decimal(20,0)")
    ).cast("double")
    return c.join(F.broadcast(s), "c_nationkey").select(
        "c_custkey",
        "c_nationkey",
        F.floor(num / F.sqrt(var_scaled) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("z_micro"),
    )


@register(
    "q_robust_scale",
    sql="""
    WITH c AS (
      SELECT c_custkey, c_nationkey,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ), q AS (
      SELECT c_nationkey,
             CAST(floor(quantile_cont(cents, 0.50) * 4 + 0.5) AS BIGINT) AS med_qc,
             CAST(floor(quantile_cont(cents, 0.75) * 4 + 0.5) AS BIGINT)
               - CAST(floor(quantile_cont(cents, 0.25) * 4 + 0.5) AS BIGINT)
               AS iqr_qc
      FROM c GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_nationkey,
           CAST(floor(CAST(4 * c.cents - q.med_qc AS DOUBLE)
                      / CAST(q.iqr_qc AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             AS robust_micro
    FROM c JOIN q USING (c_nationkey)
    """,
)
def q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/IQR) scaling — q_feature_scale's outlier-immune
    twin (RobustScaler): z-scores break when the outliers being
    normalized inflate σ; quartiles don't move.  Same quarter-cent
    exact-quantile machinery as q_iqr_outliers, cross-multiplied to
    (4·x − med_qc)/iqr_qc with both terms exact integers; the one
    float division of identical exact values (numerator can be
    negative — floor of the identical double is still bit-stable,
    unlike integer div whose truncation direction differs between
    engines) snaps to micro-units.

    Scale shape: quantile pass per group + broadcast-back narrow map —
    identical envelope to q_feature_scale; sketch-swap at 100 TB."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    q = c.groupBy("c_nationkey").agg(
        F.floor(F.expr("percentile(cents, 0.50)") * 4 + F.lit(0.5))
        .cast("long")
        .alias("med_qc"),
        (
            F.floor(F.expr("percentile(cents, 0.75)") * 4 + F.lit(0.5)).cast("long")
            - F.floor(F.expr("percentile(cents, 0.25)") * 4 + F.lit(0.5)).cast("long")
        ).alias("iqr_qc"),
    )
    return c.join(F.broadcast(q), "c_nationkey").select(
        "c_custkey",
        "c_nationkey",
        F.floor(
            (4 * F.col("cents") - F.col("med_qc")).cast("double")
            / F.col("iqr_qc").cast("double")
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("robust_micro"),
    )


@register(
    "q_log_histogram",
    sql="""
    SELECT length(printf('%b', CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)))
             AS bucket_bits,
           count(*) AS n_orders,
           CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS min_cents,
           CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS max_cents
    FROM orders
    GROUP BY bucket_bits
    """,
)
def q_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-2 (HDR-style) histogram — the latency/value histogram
    with exponentially growing buckets that covers nine orders of
    magnitude in ~30 rows, WITHOUT computing a logarithm: the bucket
    id is the value's BIT LENGTH (length of its binary rendering —
    floor(log2(x))+1 as pure integer/string ops), so the log-free
    cross-engine rule holds by construction.  Per-bucket min/max prove
    each bucket's range [2^(b-1), 2^b).

    Scale shape: one narrow projection + one ~30-group map-side-
    combinable agg — the histogram every metrics pipeline keeps
    streaming-mergeable."""
    o = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        o.select(cents.alias("cents"))
        .groupBy(F.length(F.bin(F.col("cents"))).alias("bucket_bits"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


@register(
    "q_exact_quantiles",
    sql="""
    WITH c AS (
      SELECT CAST(floor((l_extendedprice * CAST(100 AS DOUBLE)) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
      FROM lineitem
    ), tot AS (
      SELECT count(*) AS n FROM c
    ), t(lbl, num, den) AS (
      VALUES ('p50', 1, 2), ('p95', 19, 20), ('p99', 99, 100)
    ), ks AS (
      SELECT lbl, (num * n + den - 1) // den AS k FROM t, tot
    ), d AS (
      SELECT cents, count(*) AS cnt FROM c GROUP BY cents
    ), cum AS (
      SELECT cents, sum(cnt) OVER (ORDER BY cents) AS cum FROM d
    )
    SELECT ks.lbl, CAST(ks.k AS BIGINT) AS k_rank,
           CAST(min(cum.cents) AS BIGINT) AS value_cents
    FROM ks JOIN cum ON cum.cum >= ks.k
    GROUP BY ks.lbl, ks.k
    ORDER BY lbl
    """,
)
def q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p95/p99 order statistics of the price column with NO
    data-sized sort — the two-pass histogram-refinement algorithm
    that makes exact quantiles viable at 100 TB (vs q_percentiles'
    approximate GK, rows-only by contract; this key is fully
    hash-oracled because rank selection on integer cents is
    deterministic).  Pass 1 hash-aggregates 4096-cent coarse buckets
    and locates each target rank's bucket via a cumulative window
    over the BOUNDED bucket table; pass 2 re-scans with the candidate
    buckets broadcast, counts distinct cents inside them only, and
    picks the smallest value whose in-bucket running count reaches
    the residual rank.  The oracle computes the same rank definition
    (k = ceil(p*n), value = smallest cents with cum >= k) directly.
    Both passes are map-side-combinable aggs; every window runs on
    agg-sized frames."""
    li = load(spark, sf_dir, "lineitem")
    cents_df = li.select(
        F.floor((F.col("l_extendedprice") * F.lit(100.0)) + F.lit(0.5))
        .cast("long")
        .alias("cents")
    )
    from pyspark.sql import Window

    tot = cents_df.groupBy().agg(F.count(F.lit(1)).alias("n"))
    targets = spark.createDataFrame(
        [("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100)], "lbl string, num long, den long"
    )
    ks = targets.crossJoin(F.broadcast(tot)).select(
        "lbl", F.expr("(num * n + den - 1) div den").alias("k")
    )
    # pass 1: coarse buckets + cumulative over the bounded bucket table
    buckets = (
        cents_df.groupBy(F.expr("cents div 4096").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    bcum = buckets.select(
        "b", "cnt", F.sum("cnt").over(wb).alias("cum")
    ).withColumn("cum_prev", F.col("cum") - F.col("cnt"))
    cand = (
        ks.join(
            F.broadcast(bcum),
            (F.col("cum") >= F.col("k")) & (F.col("cum_prev") < F.col("k")),
        )
        .select("lbl", "k", "b", (F.col("k") - F.col("cum_prev")).alias("r"))
    )
    # pass 2: exact counts inside candidate buckets only
    invals = (
        cents_df.join(
            F.broadcast(cand), F.expr("cents div 4096") == F.col("b")
        )
        .groupBy("lbl", "k", "r", "cents")
        .agg(F.count(F.lit(1)).alias("vcnt"))
    )
    wv = (
        Window.partitionBy("lbl")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    picked = invals.select(
        "lbl", "k", "r", "cents", F.sum("vcnt").over(wv).alias("vcum")
    ).where(F.col("vcum") >= F.col("r"))
    return (
        picked.groupBy("lbl", "k")
        .agg(F.min("cents").alias("value_cents"))
        .select(
            "lbl",
            F.col("k").cast("long").alias("k_rank"),
            F.col("value_cents").cast("long").alias("value_cents"),
        )
        .orderBy("lbl")
    )
