"""Portable mergeable sketches — HLL, KMV, count-min — with FULL
cross-engine hash oracles.

Sketches are the 100 TB answer to "distinct users per dashboard tile"
and "how often does item X occur": build a fixed-size summary per
fine-grained slice ONCE (map-side combinable, kilobytes per group),
then answer rollup queries by MERGING summaries — never re-scanning
the raw data.  Spark ships DataSketches HLL (q_hll_sketch,
operators/aggregates.py) but its sketch bytes are engine-specific, so
that key is rows-only.  This module rebuilds the three classic
sketches on the repo's portable-hash foundation (CLAUDE.md md5-chunk
family) so every estimate is BIT-IDENTICAL on Spark and DuckDB and the
driver's value-hash certifies them:

- hash family: md5 of the seeded key string; the first 12 hex chars
  parse to an exact 48-bit integer on both engines, and each digest
  carries four independent 32-bit chunks (one digest = a 4-member
  hash family — q_cms_heavy pays ONE md5 per row for d=4 rows).
- HLL rho (position of the first 1-bit) without log2: both engines
  render integers in base 2 identically (Spark ``conv(w,10,2)`` ≡
  DuckDB ``bin(w)``, no padding), so ``43 - length(...)`` is the
  exact rank of a 42-bit remainder.
- the harmonic-mean denominator is summed in INTEGER space
  (``2^(43-r)`` per register, max 64·2^43 « 2^63): no float sum
  order hazard, one final double division (IEEE-exact both engines).
- HLL's small-range linear-counting branch needs ln(m/V) — a
  transcendental, but V has only 63 possible values, so the constants
  are computed once in Python and embedded as identical double
  literals in both engines' expressions (the q_benford pattern).

No reference implementation exists (/root/reference is a README stub);
semantics follow the published HLL (Flajolet et al. 2007), KMV
(Bar-Yossef et al. 2002) and count-min (Cormode & Muthukrishnan 2005)
papers.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_spark.caching import scoped_persist
from processor_spark.registry import register
from processor_spark.sources import load

# --- HLL parameters: m = 64 registers (p = 6 bucket bits, 42-bit rest)
_HLL_M = 64
_HLL_REST = 1 << 42  # 4398046511104
_HLL_ALPHA = 0.709  # published alpha_64
# A / Z with Z pre-scaled by 2^43: est_raw = (alpha * m^2 * 2^43) / int_sum
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << 43)
# linear counting table: V (zero registers) -> m * ln(m / V), V in 1..63
_LIN_TAB = {v: _HLL_M * math.log(_HLL_M / v) for v in range(1, _HLL_M)}


def _hll_row_exprs(key_col: str) -> tuple:
    """(bucket, rho) Spark columns for one key observation: top 6 bits
    of the 48-bit hash pick the register, the low 42 bits' first-1-bit
    rank is the observation (rho = 43 - bit_length(w), w=0 -> max).
    Shift/mod only — no float division anywhere near the hash."""
    dig = F.md5(
        F.concat(F.lit("hll:"), F.col(key_col).cast("string")).cast("binary")
    )
    h = F.conv(F.substring(dig, 1, 12), 16, 10).cast("long")
    bucket = F.shiftright(h, 42)
    w = F.pmod(h, F.lit(_HLL_REST))
    rho = F.when(w == 0, F.lit(43)).otherwise(
        F.lit(43) - F.length(F.conv(w, 10, 2))
    )
    return bucket, rho


def _hll_estimate_cols():
    """Spark aggregate -> estimate columns over a register stream
    (grp, r).  Returns (agg_exprs, est_col builder)."""
    int_term = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(43 - r AS INT))")
    aggs = [
        F.sum(int_term).alias("int_sum_present"),
        F.count(F.lit(1)).alias("n_present"),
    ]

    def est_col():
        int_sum = F.col("int_sum_present") + (
            F.lit(_HLL_M) - F.col("n_present")
        ) * F.lit(1 << 43)
        est_raw = F.lit(_HLL_NUM) / int_sum.cast("double")
        v = F.lit(_HLL_M) - F.col("n_present")
        lin = F.lit(None).cast("double")
        for vv in range(_HLL_M - 1, 0, -1):
            lin = F.when(v == vv, F.lit(_LIN_TAB[vv])).otherwise(lin)
        est = F.when(
            (v > 0) & (est_raw <= F.lit(2.5 * _HLL_M)), lin
        ).otherwise(est_raw)
        return F.floor(est * F.lit(10000.0) + F.lit(0.5)).cast("long")

    return aggs, est_col


def _hll_sql_rows(key_expr: str, seed: str = "hll:") -> str:
    """DuckDB twin of :func:`_hll_row_exprs` as SELECT-list fragments."""
    h = (
        f"CAST('0x' || substr(md5('{seed}' || CAST({key_expr} AS VARCHAR)), 1, 12) "
        f"AS BIGINT)"
    )
    return (
        f"{h} // {_HLL_REST} AS bucket, "
        f"CASE WHEN {h} % {_HLL_REST} = 0 THEN 43 "
        f"ELSE 43 - length(bin({h} % {_HLL_REST})) END AS rho"
    )


def _hll_sql_estimate(grp: str) -> str:
    """DuckDB estimate over a ``regs(grp, r)`` CTE — the exact integer
    sum, the one double division and the embedded linear-counting
    table, spelled to produce bit-identical doubles to the Spark side
    (all float literals wrapped CAST(x AS DOUBLE): DuckDB would
    otherwise parse them as DECIMAL and diverge — CLAUDE.md q_benford
    rule)."""
    lin_case = " ".join(
        f"WHEN {v} THEN CAST({_LIN_TAB[v]!r} AS DOUBLE)"
        for v in range(1, _HLL_M)
    )
    return f"""
    SELECT {grp},
           CAST(floor(
             CASE WHEN ({_HLL_M} - n_present) > 0
                       AND CAST({_HLL_NUM!r} AS DOUBLE)
                           / CAST(int_sum_present
                                  + ({_HLL_M} - n_present) * {1 << 43} AS DOUBLE)
                           <= CAST({2.5 * _HLL_M!r} AS DOUBLE)
                  THEN CASE ({_HLL_M} - n_present) {lin_case} END
                  ELSE CAST({_HLL_NUM!r} AS DOUBLE)
                       / CAST(int_sum_present
                              + ({_HLL_M} - n_present) * {1 << 43} AS DOUBLE)
             END * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)
           ) AS BIGINT) AS est_e4
    FROM (
      SELECT {grp},
             CAST(sum(CAST(1 AS BIGINT) << (43 - r)) AS BIGINT) AS int_sum_present,
             count(*) AS n_present
      FROM regs GROUP BY {grp}
    )
    """


@register(
    "q_hll_md5",
    sql=f"""
    WITH rows_h AS (
      SELECT o_orderstatus AS grp, {_hll_sql_rows("o_custkey")}
      FROM orders
    ),
    regs AS (
      SELECT grp, bucket, max(rho) AS r FROM rows_h GROUP BY grp, bucket
    ),
    est AS ({_hll_sql_estimate("grp")}),
    ex AS (
      SELECT o_orderstatus AS grp,
             count(DISTINCT o_custkey) AS exact_distinct
      FROM orders GROUP BY 1
    )
    SELECT est.grp AS o_orderstatus, est.est_e4 AS hll_distinct_e4,
           ex.exact_distinct
    FROM est JOIN ex ON est.grp = ex.grp
    ORDER BY o_orderstatus
    """,
)
def q_hll_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog, FULLY hash-oracled: distinct customers per
    order status estimated from 64 registers per group.  The register
    build is one map-side-combinable hash aggregate (max per (grp,
    bucket)) — at 100 TB each executor reduces its slice to ≤64 rows
    per group before the shuffle, which is the entire point of HLL on
    a cluster.  Small-range groups take the published linear-counting
    branch (deterministic via the embedded ln table).  Output is
    integer micro-units (CLAUDE.md: no engine round())."""
    o = load(spark, sf_dir, "orders")
    bucket, rho = _hll_row_exprs("o_custkey")
    regs = (
        o.select(F.col("o_orderstatus").alias("grp"), bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    aggs, est_col = _hll_estimate_cols()
    est = regs.groupBy("grp").agg(*aggs).select(
        "grp", est_col().alias("hll_distinct_e4")
    )
    exact = o.groupBy(F.col("o_orderstatus").alias("grp")).agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    return (
        est.join(exact, "grp")
        .select(
            F.col("grp").alias("o_orderstatus"),
            "hll_distinct_e4",
            "exact_distinct",
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q_hll_merge",
    sql=f"""
    WITH rows_h AS (
      SELECT c_nationkey, {_hll_sql_rows("c_custkey")}
      FROM customer
    ),
    nregs AS (
      SELECT c_nationkey, bucket, max(rho) AS r
      FROM rows_h GROUP BY c_nationkey, bucket
    ),
    regs AS (
      SELECT n.n_regionkey AS grp, nregs.bucket, max(nregs.r) AS r
      FROM nregs JOIN nation n ON nregs.c_nationkey = n.n_nationkey
      GROUP BY n.n_regionkey, nregs.bucket
    ),
    est AS ({_hll_sql_estimate("grp")}),
    ex AS (
      SELECT n.n_regionkey AS grp, count(DISTINCT c.c_custkey) AS exact_distinct
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    )
    SELECT est.grp AS n_regionkey, est.est_e4 AS hll_distinct_e4,
           ex.exact_distinct
    FROM est JOIN ex ON est.grp = ex.grp
    ORDER BY n_regionkey
    """,
)
def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGEABILITY — the property that makes sketches the 100 TB
    rollup tool: per-nation register sets (the stored fine grain) are
    merged to per-region estimates by a register-wise max, WITHOUT
    touching the raw customer stream again.  In production the nregs
    relation is what you persist per partition/day; any ad-hoc rollup
    (region, continent, global) is a max-groupBy over kilobytes.
    Identical register semantics to q_hll_md5, so the union estimate
    is exactly what a direct build at region grain would produce."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    bucket, rho = _hll_row_exprs("c_custkey")
    nregs = (
        c.select("c_nationkey", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("c_nationkey", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    regs = (
        nregs.join(F.broadcast(n), nregs.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_regionkey").alias("grp"), "bucket")
        .agg(F.max("r").alias("r"))
    )
    aggs, est_col = _hll_estimate_cols()
    est = regs.groupBy("grp").agg(*aggs).select(
        "grp", est_col().alias("hll_distinct_e4")
    )
    exact = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_regionkey").alias("grp"))
        .agg(F.countDistinct("c_custkey").alias("exact_distinct"))
    )
    return (
        est.join(exact, "grp")
        .select(
            F.col("grp").alias("n_regionkey"),
            "hll_distinct_e4",
            "exact_distinct",
        )
        .orderBy("n_regionkey")
    )


_KMV_K = 16
_KMV_NUM = float((_KMV_K - 1) * (1 << 48))  # (k-1) * 2^48, exact double


@register(
    "q_kmv_sketch",
    sql=f"""
    WITH h AS (
      SELECT DISTINCT o_orderpriority AS grp,
             CAST('0x' || substr(md5('kmv:' || CAST(o_custkey AS VARCHAR)), 1, 12)
                  AS BIGINT) AS h
      FROM orders
    ),
    kth AS (
      SELECT grp, h
      FROM (SELECT grp, h,
                   row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
            FROM h)
      WHERE rn = {_KMV_K}
    ),
    ex AS (
      SELECT o_orderpriority AS grp, count(DISTINCT o_custkey) AS exact_distinct
      FROM orders GROUP BY 1
    )
    SELECT kth.grp AS o_orderpriority,
           CAST(floor(CAST({_KMV_NUM!r} AS DOUBLE) / CAST(kth.h AS DOUBLE)
                      * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                AS BIGINT) AS kmv_distinct_e4,
           ex.exact_distinct
    FROM kth JOIN ex ON kth.grp = ex.grp
    ORDER BY o_orderpriority
    """,
)
def q_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / theta-sketch ancestor) distinct
    estimate, fully hash-oracled: the k-th smallest of the distinct
    48-bit key hashes fixes theta = h_k / 2^48 and the estimate
    (k-1)/theta — one exact integer ranking, one IEEE division.
    Streaming form keeps only k values per group; the relational form
    here ranks the DISTINCT hash stream (the distinct() partial-agg
    dedups map-side, and the per-group sort input is
    distinct-count-sized, not row-count-sized).  At extreme group
    cardinality swap the rank for a per-partition bottom-k
    (TakeOrdered-shaped) partial before the shuffle — same result,
    bounded state; the relational spelling is kept here because it is
    the form an oracle can certify."""
    o = load(spark, sf_dir, "orders")
    dig = F.md5(
        F.concat(F.lit("kmv:"), F.col("o_custkey").cast("string")).cast("binary")
    )
    h = F.conv(F.substring(dig, 1, 12), 16, 10).cast("long")
    from pyspark.sql import Window

    hs = o.select(
        F.col("o_orderpriority").alias("grp"), h.alias("h")
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    kth = (
        hs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == _KMV_K)
        .select("grp", "h")
    )
    est = kth.select(
        "grp",
        F.floor(
            F.lit(_KMV_NUM) / F.col("h").cast("double") * F.lit(10000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("kmv_distinct_e4"),
    )
    exact = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    return (
        est.join(exact, "grp")
        .select(
            F.col("grp").alias("o_orderpriority"),
            "kmv_distinct_e4",
            "exact_distinct",
        )
        .orderBy("o_orderpriority")
    )


_CMS_W = 256  # columns per row; d = 4 rows from one md5 digest


def _cms_chunk_sql(j: int, key: str) -> str:
    return (
        f"CAST('0x' || substr(md5('cms:' || CAST({key} AS VARCHAR)), "
        f"{1 + 8 * j}, 8) AS BIGINT) % {_CMS_W}"
    )


@register(
    "q_cms_heavy",
    sql=f"""
    WITH cells AS (
      SELECT s, c, count(*) AS cnt FROM (
        {" UNION ALL ".join(
            f"SELECT {j} AS s, {_cms_chunk_sql(j, 'l_suppkey')} AS c FROM lineitem"
            for j in range(4)
        )}
      ) GROUP BY s, c
    ),
    probe AS (
      {" UNION ALL ".join(
          f"SELECT l_suppkey, {j} AS s, {_cms_chunk_sql(j, 'l_suppkey')} AS c "
          f"FROM (SELECT DISTINCT l_suppkey FROM lineitem)"
          for j in range(4)
      )}
    ),
    est AS (
      SELECT probe.l_suppkey, min(cells.cnt) AS est_cnt
      FROM probe JOIN cells ON probe.s = cells.s AND probe.c = cells.c
      GROUP BY probe.l_suppkey
    ),
    ex AS (
      SELECT l_suppkey, count(*) AS exact_cnt FROM lineitem GROUP BY 1
    )
    SELECT est.l_suppkey, est.est_cnt, ex.exact_cnt,
           est.est_cnt - ex.exact_cnt AS overcount
    FROM est JOIN ex ON est.l_suppkey = ex.l_suppkey
    ORDER BY est_cnt DESC, est.l_suppkey
    LIMIT 20
    """,
)
def q_cms_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4, w=256) frequency estimates for the
    heaviest suppliers, fully hash-oracled — all-integer arithmetic,
    so parity is unconditional.  ONE md5 digest per row supplies all
    four row-hashes (32-bit chunks — the CLAUDE.md family trick:
    4x less hashing than seeded digests).  The sketch build is a
    map-side-combinable count over (s, c): every executor reduces its
    slice to <= d*w = 1024 cells before the shuffle, so sketch cost at
    100 TB is scan + tiny shuffle; point queries probe d cells and
    take the min (one-sided overestimate, asserted >= exact in
    tests).  The dim-sized probe side is generated once and
    broadcast-joined against the cells."""
    # spread=True: the md5-dense map stage would otherwise run on the
    # single fixture file's few partitions; dig is MATERIALIZED as a
    # column because Spark does NOT common-subexpression-eliminate the
    # md5 across the four array elements (8 evals/row inline — measured
    # 1.8x slower, see q_ams_f2's r7 note)
    li = load(spark, sf_dir, "lineitem", spread=True).select(
        "l_suppkey",
        F.md5(
            F.concat(F.lit("cms:"), F.col("l_suppkey").cast("string")).cast("binary")
        ).alias("dig"),
    )

    def chunk(j: int):
        return F.pmod(
            F.conv(F.substring(F.col("dig"), 1 + 8 * j, 8), 16, 10).cast("long"),
            F.lit(_CMS_W),
        )

    pairs = F.array(
        *[
            F.struct(F.lit(j).alias("s"), chunk(j).alias("c"))
            for j in range(4)
        ]
    )
    cells = (
        li.select(F.explode(pairs).alias("x"))
        .groupBy(F.col("x.s").alias("s"), F.col("x.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probe = (
        li.dropDuplicates(["l_suppkey"])
        .select("l_suppkey", F.explode(pairs).alias("x"))
        .select("l_suppkey", F.col("x.s").alias("s"), F.col("x.c").alias("c"))
    )
    est = (
        probe.join(F.broadcast(cells), ["s", "c"])
        .groupBy("l_suppkey")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    exact = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return (
        est.join(exact, "l_suppkey")
        .select(
            "l_suppkey",
            "est_cnt",
            "exact_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.desc("est_cnt"), "l_suppkey")
        .limit(20)
    )


_KSO_K = 32  # KMV set-op sketch size (each status has >= 143 distinct
# custkeys at the smallest fixture, so the k-th value always exists)
_KSO_NUM = float((_KSO_K - 1) * (1 << 48))
_P48 = float(1 << 48)


@register(
    "q_kmv_setops",
    sql=f"""
    WITH ha AS (
      SELECT DISTINCT CAST('0x' || substr(md5('kso:' || CAST(o_custkey AS VARCHAR)), 1, 12)
                           AS BIGINT) AS h
      FROM orders WHERE o_orderstatus = 'O'
    ),
    hb AS (
      SELECT DISTINCT CAST('0x' || substr(md5('kso:' || CAST(o_custkey AS VARCHAR)), 1, 12)
                           AS BIGINT) AS h
      FROM orders WHERE o_orderstatus = 'F'
    ),
    sa AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ha)
           WHERE rn <= {_KSO_K}),
    sb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hb)
           WHERE rn <= {_KSO_K}),
    ta AS (SELECT max(h) AS theta FROM sa),
    tb AS (SELECT max(h) AS theta FROM sb),
    th AS (SELECT least(ta.theta, tb.theta) AS theta FROM ta, tb),
    su AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM (SELECT h FROM sa UNION SELECT h FROM sb)
      ) WHERE rn <= {_KSO_K}
    ),
    tu AS (SELECT max(h) AS theta FROM su),
    inter AS (
      SELECT count(*) AS cnt
      FROM sa JOIN sb ON sa.h = sb.h CROSS JOIN th
      WHERE sa.h < th.theta
    ),
    exact AS (
      SELECT
        (SELECT count(DISTINCT o_custkey) FROM orders
         WHERE o_orderstatus IN ('O', 'F')) AS exact_union,
        (SELECT count(*) FROM
           (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
           JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
           USING (o_custkey)) AS exact_inter
    )
    SELECT
      CAST(floor(CAST({_KSO_NUM!r} AS DOUBLE) / CAST(tu.theta AS DOUBLE)
                 * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
        AS kmv_union_e4,
      exact.exact_union,
      CAST(floor(CAST(inter.cnt AS DOUBLE) * CAST({_P48!r} AS DOUBLE)
                 / CAST(th.theta AS DOUBLE)
                 * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
        AS kmv_inter_e4,
      exact.exact_inter
    FROM tu, th, inter, exact
    """,
)
def q_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on KMV sketches — the
    mergeable-sketch algebra that answers "distinct users in segment A
    OR B / A AND B" from kilobyte summaries, never re-joining raw
    data: union = k smallest of the combined samples (a KMV sketch
    again — closed under union); intersection = samples below
    theta = min(theta_A, theta_B) present in both, scaled by 1/theta.
    Both estimates are exact integer selections plus one IEEE
    multiply/divide chain spelled identically in both engines, so the
    key carries a full hash oracle.  The sketch build is the same
    distinct-hash partial-agg as q_kmv_sketch (map-side dedup; at
    100 TB you persist sa/sb per segment/day and run ONLY this cheap
    set algebra at query time)."""
    o = load(spark, sf_dir, "orders")
    dig = F.md5(
        F.concat(F.lit("kso:"), F.col("o_custkey").cast("string")).cast("binary")
    )
    h = F.conv(F.substring(dig, 1, 12), 16, 10).cast("long")
    from pyspark.sql import Window

    w = Window.orderBy("h")

    def sketch(status: str) -> DataFrame:
        return (
            o.where(F.col("o_orderstatus") == status)
            .select(h.alias("h"))
            .distinct()
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= _KSO_K)
            .select("h")
        )

    sa, sb = sketch("O"), sketch("F")
    ta = sa.groupBy().agg(F.max("h").alias("theta_a"))
    tb = sb.groupBy().agg(F.max("h").alias("theta_b"))
    th = ta.crossJoin(tb).select(
        F.least("theta_a", "theta_b").alias("theta")
    )
    su = (
        sa.union(sb)
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _KSO_K)
    )
    tu = su.groupBy().agg(F.max("h").alias("theta_u"))
    inter = (
        sa.join(sb, "h")
        .crossJoin(th)
        .where(F.col("h") < F.col("theta"))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    oa = o.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    ob = o.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    exact = (
        oa.union(ob)
        .distinct()
        .groupBy()
        .agg(F.count(F.lit(1)).alias("exact_union"))
        .crossJoin(
            oa.join(ob, "o_custkey")
            .groupBy()
            .agg(F.count(F.lit(1)).alias("exact_inter"))
        )
    )
    return (
        tu.crossJoin(th)
        .crossJoin(inter)
        .crossJoin(exact)
        .select(
            F.floor(
                F.lit(_KSO_NUM) / F.col("theta_u").cast("double")
                * F.lit(10000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("kmv_union_e4"),
            "exact_union",
            F.floor(
                F.col("cnt").cast("double")
                * F.lit(_P48)
                / F.col("theta").cast("double")
                * F.lit(10000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("kmv_inter_e4"),
            "exact_inter",
        )
    )


_HQ_W = 25000.0  # histogram bin width over o_totalprice
_HQ_QS = [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]


@register(
    "q_hist_quantile",
    sql=f"""
    WITH part AS (
      SELECT o_orderpriority,
             CAST(floor(o_totalprice / CAST({_HQ_W!r} AS DOUBLE)) AS BIGINT) AS b,
             count(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    merged AS (
      SELECT b, CAST(sum(n) AS BIGINT) AS n FROM part GROUP BY b
    ),
    cum AS (
      SELECT b, n, CAST(sum(n) OVER (ORDER BY b) AS BIGINT) AS c FROM merged
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM merged),
    qs AS (
      {" UNION ALL ".join(f"SELECT '{ql}' AS ql, CAST({q!r} AS DOUBLE) AS q" for ql, q in _HQ_QS)}
    ),
    hit AS (
      SELECT ql, q, b, n, c, nt,
             row_number() OVER (PARTITION BY ql ORDER BY b) AS rn
      FROM cum CROSS JOIN qs CROSS JOIN tot
      WHERE CAST(c AS DOUBLE) >= q * CAST(nt AS DOUBLE)
    )
    SELECT ql AS quantile,
           CAST(floor(
             (CAST(b AS DOUBLE) * CAST({_HQ_W!r} AS DOUBLE)
              + (q * CAST(nt AS DOUBLE) - CAST(c - n AS DOUBLE))
                / CAST(n AS DOUBLE) * CAST({_HQ_W!r} AS DOUBLE))
             * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)
           ) AS BIGINT) AS est_e4,
           nt AS n_total
    FROM hit WHERE rn = 1
    ORDER BY quantile
    """,
)
def q_hist_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from MERGED fixed-width histograms — the mergeable
    rollup answer to percentiles at 100 TB: store one tiny integer
    histogram per fine grain (here per priority, standing in for
    per-day partials), merge by summing counts (associative,
    map-side-combinable), interpolate p50/p90/p99 inside the first
    bucket whose cumulative count crosses q*N.  No raw re-scan at
    query time, no data-sized sort anywhere (the cumulative window
    runs over ~25 bucket rows).  All counts are exact integers and the
    interpolation is one identically-spelled IEEE chain, so the key
    carries a full hash oracle; accuracy (within one bin of exact) is
    property-tested."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    part = o.groupBy(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") / F.lit(_HQ_W)).cast("long").alias("b"),
    ).agg(F.count(F.lit(1)).alias("n"))
    merged = part.groupBy("b").agg(F.sum("n").cast("long").alias("n"))
    cum = merged.withColumn(
        "c", F.sum("n").over(Window.orderBy("b")).cast("long")
    )
    tot = merged.groupBy().agg(F.sum("n").cast("long").alias("nt"))
    qs = spark.createDataFrame(_HQ_QS, "ql string, q double")
    hit = (
        cum.crossJoin(F.broadcast(qs))
        .crossJoin(F.broadcast(tot))
        .where(F.col("c").cast("double") >= F.col("q") * F.col("nt").cast("double"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("ql").orderBy("b")),
        )
        .where(F.col("rn") == 1)
    )
    est = (
        F.col("b").cast("double") * F.lit(_HQ_W)
        + (F.col("q") * F.col("nt").cast("double")
           - (F.col("c") - F.col("n")).cast("double"))
        / F.col("n").cast("double") * F.lit(_HQ_W)
    )
    return hit.select(
        F.col("ql").alias("quantile"),
        F.floor(est * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("est_e4"),
        F.col("nt").alias("n_total"),
    ).orderBy("quantile")


_AMS_W = 256  # count-sketch columns; F2 std error ~ sqrt(2/w) ~ 9%


def _ams_chunk_sql(j: int, key: str) -> str:
    return (
        f"CAST('0x' || substr(md5('ams:' || CAST({key} AS VARCHAR)), "
        f"{1 + 8 * j}, 8) AS BIGINT)"
    )


@register(
    "q_ams_f2",
    sql=f"""
    WITH cells AS (
      SELECT s, c, CAST(sum(sgn) AS BIGINT) AS cell FROM (
        {" UNION ALL ".join(
            f"SELECT {j} AS s, {_ams_chunk_sql(j, 'l_partkey')} % {_AMS_W} AS c, "
            f"1 - 2 * (({_ams_chunk_sql(j, 'l_partkey')} // {_AMS_W}) % 2) AS sgn "
            f"FROM lineitem"
            for j in range(4)
        )}
      ) GROUP BY s, c
    ),
    ests AS (
      SELECT s, CAST(sum(cell * cell) AS BIGINT) AS est
      FROM cells GROUP BY s
    ),
    ranked AS (
      SELECT est, row_number() OVER (ORDER BY est, s) AS rn FROM ests
    ),
    med AS (
      SELECT CAST(sum(CASE WHEN rn IN (2, 3) THEN est ELSE 0 END) AS BIGINT)
               // 2 AS f2_est
      FROM ranked
    ),
    exact AS (
      SELECT CAST(sum(n * n) AS BIGINT) AS f2_exact
      FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY l_partkey)
    )
    SELECT CAST(med.f2_est AS BIGINT) AS f2_est, exact.f2_exact
    FROM med, exact
    """,
)
def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS / count-sketch second-moment (F2) estimate of the
    l_partkey self-join size — THE optimizer statistic for join
    planning and skew detection (F2 = sum over keys of count^2 = the
    row count a self-equi-join would produce; a heavy key inflates it
    quadratically).  Count-min's one-sided counters cannot estimate F2
    (cross-key collisions only ADD), so this uses the signed
    Tug-of-War form: each key pulls its cell by ±1 (sign and column
    both from the one md5 digest's chunks), est_s = sum of squared
    cells is UNBIASED per row, and the median of the four rows (here:
    mean of the two middle values, an exact integer halving) controls
    variance.  Everything is integer arithmetic — sums, squares,
    ranking, one integer division — so the oracle is unconditional.
    The cell build is a map-side-combinable sum over (s, c): each
    executor reduces its slice to <= 1024 cells; at 100 TB the sketch
    costs scan + tiny shuffle and is MERGEABLE (cells add across
    shards/days)."""
    # spread + materialized digest (no md5 CSE across array elements:
    # the inline spelling evaluated md5 8x/row — 5.0 s vs 2.8 s
    # measured at sf0.1 for the cell build alone)
    li = load(spark, sf_dir, "lineitem", spread=True).select(
        "l_partkey",
        F.md5(
            F.concat(F.lit("ams:"), F.col("l_partkey").cast("string")).cast("binary")
        ).alias("dig"),
    )

    def chunk(j: int):
        return F.conv(F.substring(F.col("dig"), 1 + 8 * j, 8), 16, 10).cast("long")

    triples = F.array(
        *[
            F.struct(
                F.lit(j).alias("s"),
                F.pmod(chunk(j), F.lit(_AMS_W)).alias("c"),
                # sign bit = bit 8 of the chunk (bits 0-7 pick the
                # column): integer shift, never float division
                (
                    F.lit(1)
                    - F.lit(2) * F.pmod(F.shiftright(chunk(j), 8), F.lit(2))
                ).cast("long").alias("sgn"),
            )
            for j in range(4)
        ]
    )
    from pyspark.sql import Window

    cells = (
        li.select(F.explode(triples).alias("x"))
        .groupBy(F.col("x.s").alias("s"), F.col("x.c").alias("c"))
        .agg(F.sum("x.sgn").cast("long").alias("cell"))
    )
    ests = cells.groupBy("s").agg(
        F.sum(F.col("cell") * F.col("cell")).cast("long").alias("est")
    )
    ranked = ests.withColumn(
        "rn", F.row_number().over(Window.orderBy("est", "s"))
    )
    med = ranked.groupBy().agg(
        F.expr(
            "CAST(sum(CASE WHEN rn IN (2, 3) THEN est ELSE 0 END) AS BIGINT)"
            " div 2"
        ).alias("f2_est")
    )
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy()
        .agg(F.sum(F.col("n") * F.col("n")).cast("long").alias("f2_exact"))
    )
    return med.crossJoin(exact).select(
        F.col("f2_est").cast("long").alias("f2_est"), "f2_exact"
    )


_JSZ_W = 4096  # count-sketch columns for the join-size inner product


def _jsz_cells_sql(rel: str, key: str) -> str:
    """Signed count-sketch cells over ``key`` of ``rel`` (DuckDB):
    same 'ams:' digest family for BOTH relations — required, the inner
    product only estimates the join size when the two sketches share
    their hash functions."""
    return f"""
      SELECT s, c, CAST(sum(sgn) AS BIGINT) AS cell FROM (
        {" UNION ALL ".join(
            f"SELECT {j} AS s, {_ams_chunk_sql(j, key)} % {_JSZ_W} AS c, "
            f"1 - 2 * (({_ams_chunk_sql(j, key)} // {_JSZ_W}) % 2) AS sgn "
            f"FROM {rel}"
            for j in range(4)
        )}
      ) GROUP BY s, c
    """


@register(
    "q_cms_join_size",
    sql=f"""
    WITH ca AS ({_jsz_cells_sql("lineitem", "l_partkey")}),
    cb AS ({_jsz_cells_sql(
        "(SELECT p_partkey FROM part WHERE p_brand = 'Brand#13')", "p_partkey"
    )}),
    ests AS (
      SELECT ca.s, CAST(sum(ca.cell * cb.cell) AS BIGINT) AS est
      FROM ca JOIN cb ON ca.s = cb.s AND ca.c = cb.c
      GROUP BY ca.s
    ),
    ranked AS (
      SELECT est, row_number() OVER (ORDER BY est, s) AS rn FROM ests
    ),
    med AS (
      SELECT CAST(sum(CASE WHEN rn IN (2, 3) THEN est ELSE 0 END) AS BIGINT)
               AS join_est_x2
      FROM ranked
    ),
    exact AS (
      SELECT CAST(count(*) AS BIGINT) AS join_exact
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = 'Brand#13'
    )
    SELECT med.join_est_x2, exact.join_exact FROM med, exact
    """,
)
def q_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from two signed count-sketches — the
    second optimizer statistic (q_ams_f2 is the self-join case): the
    expected size of lineitem ⋈ Brand#13-parts is the inner product
    of the per-key count vectors, and the cell-wise product of two
    SHARED-HASH count-sketches estimates it unbiasedly with variance
    F2(A)·F2(B)/w.  This is how an engine prices a join (or sizes its
    broadcast decision) without executing it — each side's sketch is a
    map-side-combinable pass you compute at ingest and keep with the
    table's stats.  The median-of-4 is kept as the SUM of the two
    middle rows (x2 units): no integer division, so no negative-value
    floor-vs-truncate divergence — everything integer end to end,
    unconditional hash oracle."""
    from pyspark.sql import Window

    def cells(df: DataFrame, key: str) -> DataFrame:
        d = df.select(
            F.md5(
                F.concat(F.lit("ams:"), F.col(key).cast("string")).cast("binary")
            ).alias("dig")
        )

        def chunk(j: int):
            return F.conv(F.substring(F.col("dig"), 1 + 8 * j, 8), 16, 10).cast(
                "long"
            )

        triples = F.array(
            *[
                F.struct(
                    F.lit(j).alias("s"),
                    F.pmod(chunk(j), F.lit(_JSZ_W)).alias("c"),
                    (
                        F.lit(1)
                        - F.lit(2)
                        * F.pmod(F.shiftright(chunk(j), 12), F.lit(2))
                    ).cast("long").alias("sgn"),
                )
                for j in range(4)
            ]
        )
        return (
            d.select(F.explode(triples).alias("x"))
            .groupBy(F.col("x.s").alias("s"), F.col("x.c").alias("c"))
            .agg(F.sum("x.sgn").cast("long").alias("cell"))
        )

    li = load(spark, sf_dir, "lineitem", spread=True).select("l_partkey")
    pb = (
        load(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    ca = cells(li, "l_partkey")
    cb = cells(pb, "p_partkey")
    ests = (
        ca.join(cb.withColumnRenamed("cell", "cellb"), ["s", "c"])
        .groupBy("s")
        .agg(F.sum(F.col("cell") * F.col("cellb")).cast("long").alias("est"))
    )
    ranked = ests.withColumn(
        "rn", F.row_number().over(Window.orderBy("est", "s"))
    )
    med = ranked.groupBy().agg(
        F.sum(F.when(F.col("rn").isin(2, 3), F.col("est")).otherwise(F.lit(0)))
        .cast("long")
        .alias("join_est_x2")
    )
    exact = (
        li.join(pb, li.l_partkey == pb.p_partkey)
        .groupBy()
        .agg(F.count(F.lit(1)).alias("join_exact"))
    )
    return med.crossJoin(exact)


def cms_cells_from(df: DataFrame, key_col: str) -> DataFrame:
    """(s, c, cnt) count-min cells for one key column — shared by the
    batch keys and the streaming pipeline (count is commutative /
    arrival-order-insensitive, so the same expression is a valid
    streaming aggregation whose state is bounded at d*w = 1024 cells
    by construction)."""
    dig = F.md5(
        F.concat(F.lit("cms:"), F.col(key_col).cast("string")).cast("binary")
    ).alias("dig")
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("s"),
                F.pmod(
                    F.conv(F.substring(F.col("dig"), 1 + 8 * j, 8), 16, 10).cast(
                        "long"
                    ),
                    F.lit(_CMS_W),
                ).alias("c"),
            )
            for j in range(4)
        ]
    )
    return (
        df.select(dig)
        .select(F.explode(pairs).alias("x"))
        .groupBy(F.col("x.s").alias("s"), F.col("x.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q_hll_sliding",
    sql=f"""
    WITH rows_h AS (
      SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS day,
             {_hll_sql_rows("user_id")}
      FROM events
    ),
    daily AS (
      SELECT day, bucket, max(rho) AS r FROM rows_h GROUP BY day, bucket
    ),
    days AS (SELECT DISTINCT day FROM daily),
    contrib AS (
      SELECT win_day, bucket, r FROM (
        SELECT unnest(range(day, day + 7 * 86400, 86400)) AS win_day, bucket, r
        FROM daily
      )
    ),
    regs AS (
      SELECT c.win_day AS grp, c.bucket, max(c.r) AS r
      FROM contrib c JOIN days d ON d.day = c.win_day
      GROUP BY c.win_day, c.bucket
    ),
    est AS ({_hll_sql_estimate("grp")}),
    nd AS (
      SELECT c.win_day, count(*) AS n_days FROM (
        SELECT unnest(range(day, day + 7 * 86400, 86400)) AS win_day FROM days
      ) c JOIN days d ON d.day = c.win_day
      GROUP BY c.win_day
    )
    SELECT est.grp AS win_day, est.est_e4 AS hll_distinct_e4,
           CAST(nd.n_days AS BIGINT) AS n_days
    FROM est JOIN nd ON nd.win_day = est.grp
    ORDER BY win_day
    """,
)
def q_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day from MERGED daily HLL
    registers — the precompute-once-roll-up-anywhere pattern that
    makes sliding distinct-count dashboards viable at 100 TB: the
    corpus is touched once to build day-sized sketches (64 registers
    per day), and every window is a register max-merge over at most
    7 x 64 rows, fully hash-oracled like the rest of the portable
    sketch tier.  The window membership is the constant-factor
    contribution explode (each day feeds its 7 trailing windows —
    the q_sliding_distinct move), never a re-scan."""
    e = load(spark, sf_dir, "events")
    bucket, rho = _hll_row_exprs("user_id")
    daily = (
        e.select(
            F.expr("((unix_micros(ts) div 1000000) div 86400) * 86400").alias("day"),
            bucket.alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    days = daily.select("day").distinct()
    contrib = daily.select(
        F.explode(F.expr("sequence(day, day + 6 * 86400, 86400)")).alias("win_day"),
        "bucket",
        "r",
    )
    regs = (
        contrib.join(
            F.broadcast(days.select(F.col("day").alias("win_day"))), "win_day"
        )
        .groupBy(F.col("win_day").alias("grp"), "bucket")
        .agg(F.max("r").alias("r"))
    )
    aggs, est_col = _hll_estimate_cols()
    est = regs.groupBy("grp").agg(*aggs).select(
        "grp", est_col().alias("hll_distinct_e4")
    )
    nd = (
        days.select(
            F.explode(F.expr("sequence(day, day + 6 * 86400, 86400)")).alias("win_day")
        )
        .join(F.broadcast(days.select(F.col("day").alias("win_day"))), "win_day")
        .groupBy("win_day")
        .agg(F.count(F.lit(1)).alias("n_days"))
    )
    return (
        est.join(nd, est.grp == nd.win_day)
        .select(
            F.col("grp").alias("win_day"),
            "hll_distinct_e4",
            F.col("n_days").cast("long").alias("n_days"),
        )
        .orderBy("win_day")
    )


# --------------------------------------------------- audience bitmaps


@register(
    "q_audience_overlap",
    sql="""
    WITH words AS (
      SELECT event_type,
             user_id // 63 AS wid,
             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER)) AS w
      FROM events
      GROUP BY event_type, user_id // 63
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             sum(bit_count(a.w & b.w)) AS n_both_part
      FROM words a
      JOIN words b ON b.wid = a.wid AND a.event_type < b.event_type
      GROUP BY 1, 2
    ), totals AS (
      SELECT event_type, sum(bit_count(w)) AS n_users
      FROM words GROUP BY event_type
    )
    SELECT p.type_a, p.type_b,
           CAST(ta.n_users AS BIGINT) AS n_a,
           CAST(tb.n_users AS BIGINT) AS n_b,
           CAST(p.n_both_part AS BIGINT) AS n_both,
           CAST((p.n_both_part * 1000000)
                // (ta.n_users + tb.n_users - p.n_both_part) AS BIGINT) AS jaccard_e6
    FROM pairs p
    JOIN totals ta ON ta.event_type = p.type_a
    JOIN totals tb ON tb.event_type = p.type_b
    ORDER BY type_a, type_b
    """,
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT audience-overlap matrix: distinct-user intersection and
    Jaccard for every event-type pair, computed on packed user
    bitmaps (63 bits per int64 word — the portable-bitmap rule) —
    the roaring-bitmap audience-analytics pattern: the corpus reduces
    once to (type, word) bitmap rows, and every pairwise intersection
    is then bit_count(AND) over the word join, never a re-scan
    (q_kmv_setops is this tier's approximate cousin; this is the
    exact one).

    Scale shape: one map-side-combinable bit_or agg (users/63 words
    per type), then a word-aligned equi-join across the 10 type
    pairs; at 1e9 users a type's bitmap is ~16M words — still an
    index-sized structure, which is the point."""
    e = load(spark, sf_dir, "events")
    words = e.groupBy(
        "event_type", F.expr("user_id div 63").alias("wid")
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT)))"
        ).alias("w")
    )
    words = scoped_persist(words)
    totals = words.groupBy("event_type").agg(
        F.expr("sum(bit_count(w))").alias("n_users")
    )
    a = words.select(F.col("event_type").alias("type_a"), "wid", F.col("w").alias("wa"))
    b = words.select(F.col("event_type").alias("type_b"), F.col("wid").alias("wid_b"), F.col("w").alias("wb"))
    pairs = (
        a.join(b, (F.col("wid") == F.col("wid_b")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.expr("sum(bit_count(wa & wb))").alias("n_both"))
    )
    ta = totals.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    tb = totals.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_both").cast("long").alias("n_both"),
            F.expr(
                "CAST((n_both * 1000000) div (n_a + n_b - n_both) AS BIGINT)"
            ).alias("jaccard_e6"),
        )
        .orderBy("type_a", "type_b")
    )


# --------------------------------------------------- weekly churn


@register(
    "q_churn_rate",
    sql="""
    WITH words AS (
      SELECT CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week,
             user_id // 63 AS wid,
             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER)) AS w
      FROM events
      GROUP BY 1, 2
    ), paired AS (
      SELECT a.week,
             sum(bit_count(a.w)) AS n_active,
             sum(CASE WHEN b.w IS NOT NULL
                      THEN bit_count(a.w & b.w) ELSE 0 END) AS n_retained
      FROM words a
      LEFT JOIN words b ON b.week = a.week + 1 AND b.wid = a.wid
      GROUP BY a.week
    )
    SELECT week,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(n_retained AS BIGINT) AS n_retained,
           CAST(n_active - n_retained AS BIGINT) AS n_churned,
           CAST(((n_active - n_retained) * 1000000) // n_active AS BIGINT) AS churn_e6
    FROM paired
    WHERE week < (SELECT max(week) FROM words)
    ORDER BY week
    """,
)
def q_churn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week churn: of the users active in week w, how many
    are absent in w+1 — the retention counter-metric, computed on the
    same packed user bitmaps as q_audience_overlap (bit_count(AND) of
    aligned words across adjacent weeks instead of across types; the
    last, successorless week is excluded).

    Scale shape: one map-side-combinable bit_or agg to (week, word)
    rows, then a word-aligned self-join shifted by one week — churn
    for a billion users is an AND over two ~16M-word bitmaps, never a
    distinct-user set comparison."""
    e = load(spark, sf_dir, "events")
    words = e.groupBy(
        F.expr("CAST(floor(unix_micros(ts) / 604800000000.0) AS BIGINT)").alias("week"),
        F.expr("user_id div 63").alias("wid"),
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT)))"
        ).alias("w")
    )
    words = scoped_persist(words)
    b = words.select(
        (F.col("week") - 1).alias("week_b"), F.col("wid").alias("wid_b"), F.col("w").alias("wb")
    )
    paired = (
        words.join(b, (F.col("week") == F.col("week_b")) & (F.col("wid") == F.col("wid_b")), "left")
        .groupBy("week")
        .agg(
            F.expr("sum(bit_count(w))").alias("n_active"),
            F.expr(
                "sum(CASE WHEN wb IS NOT NULL THEN bit_count(w & wb) ELSE 0 END)"
            ).alias("n_retained"),
        )
    )
    last_week = words.agg(F.max("week").alias("max_week"))
    return (
        paired.crossJoin(F.broadcast(last_week))
        .where(F.col("week") < F.col("max_week"))
        .select(
            "week",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("n_retained").cast("long").alias("n_retained"),
            (F.col("n_active") - F.col("n_retained")).cast("long").alias("n_churned"),
            F.expr(
                "CAST(((n_active - n_retained) * 1000000) div n_active AS BIGINT)"
            ).alias("churn_e6"),
        )
        .orderBy("week")
    )
