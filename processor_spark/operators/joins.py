"""Join operators (SURVEY.md §2.3, minus temporal joins → temporal.py).

Scale posture per join:
- Star joins (q_join_5way): explicit ``F.broadcast`` on region/nation —
  constant-size dims broadcast at any SF, so the only shuffles left are
  customer⋈orders⋈lineitem, which share no key; AQE + CBO order them.
  At 100 TB, orders/lineitem would be bucketed on the join key to make
  the big join shuffle-free.
- Semi/anti joins ship only the key column of the probe side.
- Theta join keeps the build side tiny (supplier) so Catalyst picks
  BroadcastNestedLoopJoin instead of a cartesian shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_spark.registry import register
from processor_spark.sources import load


@register(
    "q_join_inner",
    sql="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; filter on the build side prunes before the shuffle."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "q_join_5way",
    sql="""
    SELECT n.n_name AS nation, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders   o ON c.c_custkey  = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation   n ON c.c_nationkey = n.n_nationkey
    JOIN region   r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_join_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-way star join + agg (TPC-H Q5 shape), revenue by nation.

    region/nation broadcast explicitly; the region filter reduces
    nation to ~5 rows before it ever touches customer, so the broadcast
    carries only matching nations (a static partition-prune analogue).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    # build from the selective side outward so the FACT table streams:
    # region filter → nation → customer → orders gives a small
    # (orderkey, n_name) relation; lineitem then probes it.  Writing the
    # fact table as the left/probe side matters at scale — the reversed
    # order invites the planner to build a hash relation over lineitem.
    dim = F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    co = c.join(dim, c.c_nationkey == dim.n_nationkey).select("c_custkey", "n_name")
    o2 = o.join(co, o.o_custkey == co.c_custkey).select("o_orderkey", "n_name")
    # shuffle_hash on the reduced (orders⋈customer) side: build the
    # per-partition hash table over the small relation and stream the
    # fact — no sort of lineitem, no broadcast of anything fact-sized.
    # Scale-safe at 100 TB (the build side is per-partition, not
    # driver-collected); measured ~30% faster than the unhinted plan at
    # sf0.1, where AQE picked the 600 k-row side as the build.
    return (
        li.join(o2.hint("shuffle_hash"), li.l_orderkey == o2.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q_join_left",
    sql="""
    SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0.0), 2) AS total_spend
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders (count → 0)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@register(
    "q_join_semi",
    sql="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000.0
    )
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers with at least one big order.

    Semi join shuffles only the distinct probe keys — at scale the
    filtered orders side collapses to its key column before exchange.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q_join_anti",
    sql="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders at all."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q_join_theta",
    sql="""
    SELECT c.c_custkey, s.s_suppkey,
           round(abs(c.c_acctbal - s.s_acctbal), 2) AS bal_gap
    FROM customer c
    JOIN supplier s
      ON c.c_nationkey = s.s_nationkey
     AND abs(c.c_acctbal - s.s_acctbal) < 10.0
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/band join: same-nation customer–supplier pairs with close balances.

    Expressed as equi-join on nationkey + residual inequality so the
    planner can hash-partition on the equi key (100 TB-safe) instead of
    a nested-loop cartesian; the band predicate is a cheap residual.
    """
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    return (
        c.join(
            s,
            (c.c_nationkey == s.s_nationkey)
            & (F.abs(c.c_acctbal - s.s_acctbal) < 10.0),
        )
        .select(
            "c_custkey",
            "s_suppkey",
            F.round(F.abs(F.col("c_acctbal") - F.col("s_acctbal")), 2).alias("bal_gap"),
        )
    )


@register(
    "q_join_cross",
    sql="""
    SELECT r.r_name, n.n_name,
           CASE WHEN r.r_regionkey = n.n_regionkey THEN 1 ELSE 0 END AS is_home
    FROM region r
    CROSS JOIN nation n
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of tiny dims (5 × 25); guarded to constant-size inputs."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name",
        "n_name",
        F.when(F.col("r_regionkey") == F.col("n_regionkey"), 1).otherwise(0).alias("is_home"),
    )


@register(
    "q_join_full",
    sql="""
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           coalesce(c.n_customers, 0) AS n_customers,
           coalesce(s.n_suppliers, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers
          FROM customer GROUP BY 1) c
    FULL JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
               FROM supplier GROUP BY 1) s
      ON c.nationkey = s.nationkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: nations having customers, suppliers, or either —
    rows preserved from BOTH sides with zero-filled counts."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        c.join(s, "nationkey", "full")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


_NAAJ_SQL = """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE nullif(c_nationkey, 5) NOT IN (
      SELECT s_nationkey FROM supplier WHERE s_suppkey % 3 = 0
    )
"""


@register("q_join_anti_nullaware", sql=_NAAJ_SQL)
def q_join_anti_nullaware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-aware anti join — NOT IN under SQL three-valued logic,
    which left_anti does NOT implement: a NULL probe key (here
    nationkey 5, nulled via nullif) is never 'not in' anything, so
    those rows are excluded too.  Catalyst plans the dedicated
    null-aware single-column anti join against the broadcast build
    side; at scale keep NOT IN lists single-column and null-free when
    possible (then it degrades to the cheap left_anti)."""
    from processor_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(_NAAJ_SQL)


# --- bucketed sort-merge-bucket join (the 100 TB fact⋈fact pattern) ---

_N_BUCKETS = 8


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Materialize orders/lineitem as bucketed+sorted catalog tables
    (one-time per session/sf_dir; the pre-shuffle is paid at write
    time, the currency of every later join on the key).

    ``repartition(n, key)`` before the bucketed write uses the same
    murmur3 hash as the bucket spec, so each task owns exactly one
    bucket → ONE file per bucket, which is what lets the scan report
    its sort order and the join skip both the Exchange and (per-file)
    Sort.  Bucket metadata lives only in the session catalog, so a
    fresh session (e.g. the driver's) rebuilds the tables on first
    use; subsequent calls in the same session reuse them.
    """
    import hashlib
    import os
    import shutil
    import time
    import uuid

    # ADVICE r5: data files are SHARED per sf_dir (bounded disk — the
    # r5 per-application path left one copy per session forever), while
    # catalog isolation stays per session via the table NAME.  The
    # write race between concurrent sessions is closed by building
    # under a writer-unique scratch path and publishing with one atomic
    # os.rename — the loser's rename fails and it adopts the winner's
    # files (both wrote identical bucket layouts from the same fixture).
    root = "/tmp/processor_spark_bucketed"
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    app_tag = hashlib.md5(spark.sparkContext.applicationId.encode()).hexdigest()[:6]
    base = os.path.join(root, tag)

    # best-effort stale-sibling cleanup: published dirs are one-per-
    # sf_dir now, but pre-r6 per-session dirs (and crashed writers'
    # scratch dirs) would otherwise live in /tmp forever.  Only dirs
    # untouched for >6h are removed — and since directory mtime does
    # NOT advance on reads (ADVICE r6), every session touches its own
    # tag dir below on each use, so a >6h-lived session's files are
    # never raced by a sibling using a different fixture.
    if os.path.isdir(root):
        cutoff = time.time() - 6 * 3600
        for sib in os.listdir(root):
            p = os.path.join(root, sib)
            if sib != tag:
                try:
                    if os.path.getmtime(p) < cutoff:
                        shutil.rmtree(p, ignore_errors=True)
                except OSError:
                    pass

    names: dict[str, str] = {}
    for tbl, key, cols in (
        ("orders", "o_orderkey", ["o_orderkey", "o_orderpriority"]),
        ("lineitem", "l_orderkey", ["l_orderkey", "l_extendedprice", "l_discount"]),
    ):
        name = f"{tbl}_bkt_{tag}_{app_tag}"
        path = os.path.join(base, tbl)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            df = load(spark, sf_dir, tbl).select(*cols)
            scratch_name = f"{name}_scratch"
            scratch_path = os.path.join(base, f".{tbl}.tmp-{uuid.uuid4().hex[:8]}")
            spark.sql(f"DROP TABLE IF EXISTS {scratch_name}")
            (
                df.repartition(_N_BUCKETS, key)
                .write.mode("overwrite")
                .option("path", scratch_path)
                .bucketBy(_N_BUCKETS, key)
                .sortBy(key)
                .saveAsTable(scratch_name)
            )
            spark.sql(f"DROP TABLE IF EXISTS {scratch_name}")  # external: files stay
            try:
                os.rename(scratch_path, path)  # atomic publish
            except OSError:
                shutil.rmtree(scratch_path, ignore_errors=True)  # lost the race
        # register THIS session's catalog entry over the published files;
        # rebuild the entry if it points at since-deleted data (the
        # /tmp _SUCCESS guard, same as _orc_copy)
        if spark.catalog.tableExists(name) and not os.path.exists(
            os.path.join(path, "_SUCCESS")
        ):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        if not spark.catalog.tableExists(name):
            df = load(spark, sf_dir, tbl).select(*cols)
            ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
            spark.sql(
                f"CREATE TABLE {name} ({ddl}) USING PARQUET "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {_N_BUCKETS} BUCKETS "
                f"LOCATION '{path}'"
            )
        names[tbl] = name
    # record liveness: advance the tag dir's mtime on every use so the
    # sibling cleanup above (mtime > 6h) can never reap files a
    # long-lived session still has registered in its catalog (ADVICE
    # r6 — reads alone don't update directory mtime)
    try:
        os.utime(base)
    except OSError:
        pass
    return names


@register(
    "q_bucketed_join",
    sql="""
    SELECT o.o_orderkey,
           min(o.o_orderpriority) AS priority,
           count(*) AS n_items,
           CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                    * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
             AS revenue_e4
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey
    """,
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact⋈fact join via bucketed tables: orders and
    lineitem are bucketed+sorted on the order key, so the sort-merge
    join AND the per-order aggregate both reuse the write-time
    partitioning — the final plan contains ZERO Exchange (asserted in
    tests/test_plans.py).  This is the single most common 100 TB join
    pattern: pay the shuffle once when the table lands, never again.

    Revenue is computed in exact integer 1e-4-dollar units
    (floor(x*100+0.5) cents × (100 - discount%)), so both engines sum
    identical integers and no float round can straddle a half-even /
    half-up boundary (CLAUDE.md integer-micro-unit rule).
    """
    names = _bucketed_tables(spark, sf_dir)
    # merge hint: at fixture scale Catalyst would broadcast the small
    # orders side, hiding the thing this key demonstrates; at 100 TB
    # neither fact side broadcasts and SMB is what the planner picks
    # unaided.
    o = spark.table(names["orders"]).hint("merge")
    li = spark.table(names["lineitem"])
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    dpct = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.min("o_orderpriority").alias("priority"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum(cents * (F.lit(100) - dpct)).alias("revenue_e4"),
        )
    )


# spatial-join parameters: synthetic integer coordinates in a
# 10000x10000 space, radius 400, grid cell 512 (>= radius, so a 3x3
# neighborhood of cells is a complete candidate cover)
GEO_R = 400
GEO_CELL = 512


@register(
    "q_join_spatial",
    sql=f"""
    WITH a AS (
      SELECT c_custkey AS a_id,
             (c_custkey * 37) % 10000 AS ax,
             (c_custkey * 73) % 10000 AS ay
      FROM customer
    ), b AS (
      SELECT s_suppkey AS b_id,
             (s_suppkey * 41) % 10000 AS bx,
             (s_suppkey * 97) % 10000 AS by
      FROM supplier
    )
    SELECT a.a_id, b.b_id,
           CAST((ax - bx) * (ax - bx) + (ay - by) * (ay - by) AS BIGINT) AS d2
    FROM a JOIN b
      ON (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= {GEO_R * GEO_R}
    ORDER BY d2, a_id, b_id
    """,
)
def q_join_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance (spatial) join via grid bucketing — all point pairs
    within radius {GEO_R} of each other in a synthetic integer
    coordinate space (points derived from customer/supplier keys).

    The naive form is a cross join with a distance predicate — O(n·m)
    and planned as a nested loop.  The scalable form used here is the
    standard grid trick: snap each point to a {GEO_CELL}-sized cell,
    EXPLODE one side into its 3×3 neighboring cells (a constant ×9
    blow-up of the SMALLER side), equi-join on the cell id, then
    filter by exact squared distance — all-integer, so the oracle (a
    brute-force theta join, deliberately the naive form) replays it
    bit-free.  At 100 TB the shuffle key is the cell: candidate pairs
    are O(points per neighborhood), never all-pairs, and skew maps to
    spatial density (handled the same way as any hot key — salting —
    if a cell overflows).  Plan-guarded: no CartesianProduct.
    """
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    a = c.select(
        F.col("c_custkey").alias("a_id"),
        ((F.col("c_custkey") * 37) % 10000).alias("ax"),
        ((F.col("c_custkey") * 73) % 10000).alias("ay"),
    ).withColumn(
        "cell",
        F.concat_ws(",", F.expr(f"ax div {GEO_CELL}"), F.expr(f"ay div {GEO_CELL}")),
    )
    # expand the smaller side into its 3x3 cell neighborhood
    b = (
        s.select(
            F.col("s_suppkey").alias("b_id"),
            ((F.col("s_suppkey") * 41) % 10000).alias("bx"),
            ((F.col("s_suppkey") * 97) % 10000).alias("by"),
        )
        .select(
            "b_id",
            "bx",
            "by",
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(-1, 1), dx ->"
                    f" transform(sequence(-1, 1), dy ->"
                    f" concat_ws(',', bx div {GEO_CELL} + dx, by div {GEO_CELL} + dy))))"
                )
            ).alias("cell"),
        )
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        a.join(b, "cell")
        .where(d2 <= GEO_R * GEO_R)
        .select("a_id", "b_id", d2.cast("long").alias("d2"))
        .orderBy("d2", "a_id", "b_id")
    )


@register(
    "q_join_lateral",
    sql="""
    SELECT c.c_custkey, l.o_orderkey, l.price_c
    FROM customer c,
    LATERAL (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY price_c DESC, o_orderkey
      LIMIT 2
    ) l
    """,
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — each customer's 2 most expensive
    orders, written as the per-row subquery a SQL user reaches for.
    The engine must NOT execute it per-row: Catalyst decorrelates the
    lateral ORDER BY ... LIMIT into a window/aggregate over ONE join,
    so the plan is a single co-partitioned pass over orders rather
    than |customer| point lookups — the difference between a 100 TB
    plan and a driver loop.  Exact integer cents; (price, orderkey)
    totally orders each customer's slice so the top-2 cut is
    deterministic on both engines."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("cust_lat")
    load(spark, sf_dir, "orders").createOrReplaceTempView("ord_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey, l.price_c
        FROM cust_lat c,
        LATERAL (
          SELECT o_orderkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
          FROM ord_lat o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY price_c DESC, o_orderkey
          LIMIT 2
        ) l
        """
    )
