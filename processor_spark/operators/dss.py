"""Decision-support suite (TPC-H-shaped analytics, adapted to the fixtures).

The reference declares only "transformations on collections"
(/root/reference/README.md:2); the canonical public workload for
set-at-a-time analytics is the TPC-H decision-support suite, so each
classic query shape is re-expressed here against the driver fixtures
(FIXTURES.md) — which lack ``partsupp`` and several TPC-H columns
(l_shipmode, l_commitdate, c_phone) — with the *shape* preserved:
multi-way joins, EXISTS/NOT-EXISTS decorrelation, correlated scalar
subqueries, group-filter-topk pipelines.

Scale posture (100 TB):
- Every query keeps dims (region/nation/supplier/part at fixture
  ratios) on the broadcast side; only fact⋈fact joins shuffle.
- Correlated subqueries are written as explicit joins/windows so
  Catalyst never falls back to a nested-loop re-execution.
- Top-k outputs use orderBy().limit() → TakeOrderedAndProject (no
  global sort), with deterministic tie-breaks per CLAUDE.md.
- Threshold predicates compare only binary-exact values (integer-
  valued double sums) so boundary rows cannot flip between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from processor_spark.registry import register
from processor_spark.sources import load


@register(
    "q_dss_shipping_priority",
    sql="""
    SELECT o.o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q_dss_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue ranking for one segment.

    customer is filtered to one segment BEFORE the join (the filter
    prunes ~80% of the probe side pre-shuffle); top-10 via
    orderBy().limit() so the planner emits TakeOrderedAndProject.
    """
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1997-01-01")
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1997-01-01")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q_dss_order_priority",
    sql="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def q_dss_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority check via EXISTS semi join.

    The l_commitdate/l_receiptdate columns don't exist in the fixture,
    so "late" = any line shipped >60 days after the order date. The
    EXISTS is a left-semi join: only (l_orderkey, l_shipdate) ships to
    the shuffle, and the semi join stops probing a key on first match.
    """
    o = load(spark, sf_dir, "orders")
    late = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(late, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q_dss_forecast_revenue",
    sql="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q_dss_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-table filtered global aggregate.

    All three predicates push into the parquet scan (PushedFilters);
    the agg is a 2-phase partial+final with a 1-row result — the
    cheapest possible shape at 100 TB since no shuffle carries data,
    only 1 partial row per task.
    """
    l = load(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "q_dss_volume_shipping",
    sql="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_dss_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.

    nation joins broadcast twice under different aliases; the nation
    filter semi-prunes supplier and customer down to ~8% before they
    meet the facts, so the big shuffles carry only qualifying rows.
    """
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = ["NATION_1", "NATION_2"]
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n.where(F.col("n_name").isin(pair))), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n.where(F.col("n_name").isin(pair))), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q_dss_market_share",
    sql="""
    WITH vol AS (
        SELECT year(o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n1.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        JOIN region r   ON n2.n_regionkey = r.r_regionkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q_dss_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share inside a region, by year.

    8-way join where every dim side broadcasts; the only shuffles are
    lineitem⋈orders and the final tiny groupBy. The share is a
    conditional-sum / sum ratio computed in one aggregation pass.
    """
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_nations = (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cnk"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(cust_nations), F.col("c_nationkey") == F.col("cnk"))
        .select("c_custkey")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    vol = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


@register(
    "q_dss_product_profit",
    sql="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.5 * p.p_retailprice * l.l_quantity), 2) AS profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'STANDARD'
    GROUP BY nation, o_year
    """,
)
def q_dss_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year.

    No partsupp fixture exists, so unit cost is proxied as
    0.5*p_retailprice (binary-exact product — 0.5 is a power of two,
    so both engines compute identical doubles before the rounded sum).
    """
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD").select(
        "p_partkey", "p_retailprice"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                2,
            ).alias("profit")
        )
    )


@register(
    "q_dss_returned_items",
    sql="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, nation
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_dss_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a quarter.

    The quarter filter prunes orders before the lineitem join; the
    returnflag filter pushes into the lineitem scan. Top-20 by
    TakeOrderedAndProject with c_custkey tie-break.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "nation")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_dss_cust_distribution",
    sql="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q_dss_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of customers by (non-urgent) order count.

    The join-predicate filter lives in the LEFT JOIN condition (not a
    WHERE — that would turn it inner); customers with zero orders
    land in the c_count=0 bucket. Double aggregation, both map-side
    combinable.
    """
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q_dss_promo_effect",
    sql="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    """,
)
def q_dss_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month.

    part broadcasts (only p_partkey/p_type, pruned to 2 columns);
    the month filter pushes into the lineitem scan, so the join probe
    touches ~1/80 of the fact table.
    """
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-06-01") & (F.col("l_shipdate") < "1996-07-01")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).agg(
        F.round(
            100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev),
            6,
        ).alias("promo_revenue_pct")
    )


@register(
    "q_dss_top_supplier",
    sql="""
    WITH srev AS (
        SELECT l_suppkey AS suppkey,
               sum(l_extendedprice * (1 - l_discount)) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, round(r.total_rev, 2) AS total_revenue
    FROM srev r JOIN supplier s ON s.s_suppkey = r.suppkey
    QUALIFY row_number() OVER (ORDER BY round(r.total_rev, 2) DESC, s.s_suppkey) = 1
    """,
)
def q_dss_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the single top-revenue supplier for a quarter.

    The classic view-plus-max is expressed as arg-max via
    orderBy().limit(1) with an s_suppkey tie-break (CLAUDE.md: arg_max
    needs a composite key) — this plans TakeOrderedAndProject
    (per-partition heaps), NOT a global window, so it scales to any
    supplier cardinality. Selection orders by the ROUNDED sum on both
    engines (ADVICE r1): partition sum-order can flip the last bit of
    the double, so the unrounded value is not a stable cross-engine
    selection key.
    """
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    srev = l.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        srev.join(F.broadcast(s), F.col("s_suppkey") == F.col("suppkey"))
        .orderBy(F.desc(F.round("total_rev", 2)), F.asc("s_suppkey"))
        .limit(1)
        .select("s_suppkey", "s_name", F.round("total_rev", 2).alias("total_revenue"))
    )


@register(
    "q_dss_small_qty_revenue",
    sql="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
        SELECT l_partkey, 0.5 * avg(l_quantity) AS qty_cut
        FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < a.qty_cut
    """,
)
def q_dss_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one brand.

    The correlated per-part AVG subquery is decorrelated into an
    explicit pre-aggregated join (Catalyst would do the same; writing
    it out keeps the plan obvious). l_quantity is integer-valued, and
    0.5*avg is exact-in-binary halves of an exact rational — but the
    strict < against qty_cut only flips if sum-order changes the avg,
    which it cannot (integer-valued doubles sum exactly).
    """
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3").select("p_partkey")
    cuts = l.groupBy(F.col("l_partkey").alias("cut_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(cuts, F.col("l_partkey") == F.col("cut_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q_dss_large_volume_cust",
    sql="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING sum(l.l_quantity) > 150
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q_dss_large_volume_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (HAVING over a fact agg).

    The quantity threshold compares exact integer-valued double sums
    (no float hazard). Grouped on the join key, so the lineitem agg
    pre-shrinks before the customer join at 100 TB.
    """
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 150)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty").cast("bigint").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q_dss_discounted_revenue",
    sql="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q_dss_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-branch predicate over a join.

    The OR-of-ANDs spans both tables so it can't fully push down, but
    Catalyst extracts the common p_partkey equi-condition and leaves
    the disjunction as a post-join filter on a broadcast join —
    exactly the hash-join + residual shape Q19 is designed to test.
    """
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40))
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(branch)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q_dss_waiting_suppliers",
    sql="""
    WITH marked AS (
        SELECT l_suppkey, l_orderkey,
               l_shipdate = max(l_shipdate) OVER (PARTITION BY l_orderkey) AS is_latest,
               count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_supp
        FROM lineitem
    )
    SELECT s.s_name, count(DISTINCT m.l_orderkey) AS numwait
    FROM marked m JOIN supplier s ON s.s_suppkey = m.l_suppkey
    WHERE m.is_latest AND m.n_supp > 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q_dss_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who held up multi-supplier orders.

    Without commit/receipt dates, "waiting on" = this supplier shipped
    the LAST line of an order that involved >1 supplier. The classic
    EXISTS / NOT EXISTS pair collapses into two analytic windows over
    one lineitem pass — one shuffle by l_orderkey instead of two
    self-joins (the 100 TB win of the window formulation).
    """
    l = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey", "l_shipdate")
    w = Window.partitionBy("l_orderkey")
    marked = l.select(
        "l_suppkey",
        "l_orderkey",
        (F.col("l_shipdate") == F.max("l_shipdate").over(w)).alias("is_latest"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        marked.where(F.col("is_latest") & (F.col("n_supp") > 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "q_dss_sales_opportunity",
    sql="""
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS cut FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey % 10 AS cntrycode,
           count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c, avg_bal a
    WHERE c.c_acctbal > a.cut
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY cntrycode
    """,
)
def q_dss_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers with no RECENT orders, by country code.

    No c_phone fixture column, so cntrycode := c_nationkey % 10; and
    every fixture customer has ≥1 lifetime order, so "dormant" = no
    order since 2000-01-01 (keeps the anti-join non-vacuous at every
    SF). The scalar AVG subquery broadcasts as a 1-row cross join;
    the NOT EXISTS is a left-anti join shipping only the filtered
    o_custkey column. avg() of arbitrary doubles differs in last-bit
    across engines only if a balance lands exactly ON the cut —
    probability ~2^-52.
    """
    c = load(spark, sf_dir, "customer")
    cut = c.where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("cut"))
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(cut))
        .where(F.col("c_acctbal") > F.col("cut"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
        .agg(F.count("*").alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
    )


@register(
    "q_dss_ship_delay",
    sql="""
    SELECT CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE date_diff('day', o.o_orderdate, l.l_shipdate) > 90
    GROUP BY 1
    """,
)
def q_dss_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no l_shipmode/commitdate in the fixture
    schema): lines shipped >90 days after their order date, counted per
    ship year split by order-priority class.

    The fact-fact join shuffles on l_orderkey/o_orderkey; the delay
    predicate is evaluated post-join (it references both sides) but the
    priority split is a conditional agg, one pass.  Integer counts only
    — no float parity risk.
    """
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90)
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q_dss_important_parts",
    sql="""
    WITH pq AS (
        SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, total_qty
    FROM pq
    WHERE total_qty * 2000 > (SELECT CAST(sum(total_qty) AS BIGINT) FROM pq)
    """,
)
def q_dss_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: no partsupp table — lineitem quantity
    stands in for stock value): parts whose shipped quantity exceeds
    0.05% of the global total.

    The scalar global total broadcasts as a 1-row cross join against
    the per-part agg.  Parity hazard avoided by construction: quantity
    is integer-valued, so both the per-part sums and the global sum are
    EXACT in any summation order, and the threshold compare is pure
    64-bit integer arithmetic (total_qty * 2000 > grand_total) — no
    float rounding anywhere.
    """
    l = load(spark, sf_dir, "lineitem")
    pq = l.groupBy("l_partkey").agg(
        F.sum("l_quantity").cast("bigint").alias("total_qty")
    )
    total = pq.agg(F.sum("total_qty").cast("bigint").alias("grand_total"))
    return (
        pq.crossJoin(F.broadcast(total))
        .where(F.col("total_qty") * 2000 > F.col("grand_total"))
        .select("l_partkey", "total_qty")
    )


@register(
    "q_dss_parts_suppliers",
    sql="""
    SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 9, 19, 29, 39, 49)
      AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
      )
    GROUP BY p.p_brand, p.p_size
    """,
)
def q_dss_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: lineitem is the part-supplier bridge —
    the fixture has no partsupp): distinct supplier count per
    (brand, size) for selected sizes, excluding one brand and a
    denylisted supplier set.

    The supplier denylist (NOT IN, all keys non-null by schema) plans
    as a broadcast anti join; part filters push into the dimension
    before the fact join; count(DISTINCT) expands to a two-level agg.
    """
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load(spark, sf_dir, "part")
        .where((F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 9, 19, 29, 39, 49))
        .select("p_partkey", "p_brand", "p_size")
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_name").like("%7"))
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), l.l_suppkey == F.col("bad_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
