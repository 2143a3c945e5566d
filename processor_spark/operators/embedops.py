"""Embedding compression and decomposition — int8 quantization and
top-principal-component extraction, with FULL cross-engine hash
oracles.

These are the two embedding-table operations a 100 TB training-data
pipeline runs right after computing vectors:

- **q_embed_quantize** — per-dimension affine int8 quantization (the
  standard ANN-index compression: 4x smaller than float32, and the
  min/max + scale stats ARE the dequantization codebook).  Exactness
  strategy: min/max over doubles are order-free, the quantize/
  dequantize expressions use only + - * / and floor (IEEE-identical
  when the expression trees match, CLAUDE.md), and the reconstruction
  error is integerized PER ROW (floor(err^2 * 1e12 + 0.5) as BIGINT)
  so the sum is an exact integer on both engines.

- **q_embed_pca** — the top principal component by fixed-K power
  iteration over the exact covariance matrix.  The corpus-sized work
  is ONE pass building an integer Gramian: components are quantized
  to 1e-6 units (exact BIGINT), per-dimension sums and the upper
  triangle of sum(q_j * q_k) are exact int64 sums (order-free), and
  the covariance combine n*G_jk - S_j*S_k is widened to 128-bit
  (Spark decimal(38,0) <-> DuckDB HUGEINT — the r4 bridge) before ONE
  conversion to double.  Power iteration then runs on the d x d
  matrix (64 rows) with ordered folds (Spark zip_with+aggregate <->
  DuckDB list_transform+list_reduce, the CLAUDE.md exact-fold twin);
  sqrt is IEEE-correctly-rounded on both engines so the final
  normalization is bit-identical too.

Scale shape: quantization is explode -> two hash aggs with a 64-row
broadcast join back (partial aggs crush the exploded stream map-side);
the Gramian explodes d(d+1)/2 = 2080 products per row but the partial
agg reduces every executor's slice to <= 2080 cells before the
shuffle — the same map-side-combine story as the sketch tier.  Power
iteration touches only d-sized frames.

No reference implementation exists (/root/reference is a README
stub); semantics follow standard affine quantization (e.g. the
ONNX/TFLite uint8 scheme) and textbook power iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_spark.caching import scoped_persist
from processor_spark.registry import register
from processor_spark.sources import load

_D = 64  # embedding dimensionality (TESTDATA.md fixture contract)
_PCA_K = 5  # power-iteration rounds (unrolled identically in the oracle)


# ---------------------------------------------------------------- quantize


@register(
    "q_embed_quantize",
    sql=f"""
    WITH comp AS (
      SELECT p.pos, CAST(embedding AS DOUBLE[])[p.pos] AS val
      FROM embeddings
      CROSS JOIN (SELECT unnest(range(1, {_D + 1})) AS pos) p
    ), stats AS (
      SELECT pos, min(val) AS vmin, max(val) AS vmax
      FROM comp GROUP BY pos
    ), sc AS (
      SELECT pos, vmin, vmax,
             CASE WHEN vmax > vmin
                  THEN (vmax - vmin) / CAST(255 AS DOUBLE)
                  ELSE CAST(1 AS DOUBLE) END AS scale
      FROM stats
    ), rowsq AS (
      SELECT c.pos, c.val, s.vmin, s.scale,
             LEAST(CAST(255 AS BIGINT), GREATEST(CAST(0 AS BIGINT),
               CAST(floor(((c.val - s.vmin) / s.scale) + CAST(0.5 AS DOUBLE))
                    AS BIGINT))) AS qv
      FROM comp c JOIN sc s USING (pos)
    ), errs AS (
      SELECT pos, qv,
             ((vmin + (CAST(qv AS DOUBLE) * scale)) - val) AS err
      FROM rowsq
    )
    SELECT e.pos,
           count(*) AS n_vals,
           CAST(floor((min(s.vmin) * CAST(1e9 AS DOUBLE)) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS min_e9,
           CAST(floor((min(s.vmax) * CAST(1e9 AS DOUBLE)) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS max_e9,
           CAST(floor((min(s.scale) * CAST(1e12 AS DOUBLE)) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS scale_e12,
           CAST(sum(CASE WHEN e.qv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
           CAST(sum(CASE WHEN e.qv = 255 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
           CAST(sum(CAST(floor(((e.err * e.err) * CAST(1e12 AS DOUBLE)) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sse_e12
    FROM errs e JOIN sc s USING (pos)
    GROUP BY e.pos
    ORDER BY e.pos
    """,
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension affine int8 quantization of the embedding table:
    codebook stats (min/max/scale), saturation counts, and the exact
    integerized reconstruction SSE.  Two passes over the exploded
    component stream (stats agg, then error agg) with the 64-row
    codebook broadcast back between them — at 100 TB each pass is one
    map-side-combinable hash agg and the join adds no shuffle."""
    em = load(spark, sf_dir, "embeddings", spread=True)
    comp = em.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "val")
    ).select((F.col("pos0") + 1).alias("pos"), "val")
    stats = comp.groupBy("pos").agg(
        F.min("val").alias("vmin"), F.max("val").alias("vmax")
    )
    sc = stats.select(
        "pos",
        "vmin",
        "vmax",
        F.when(
            F.col("vmax") > F.col("vmin"),
            (F.col("vmax") - F.col("vmin")) / F.lit(255.0),
        )
        .otherwise(F.lit(1.0))
        .alias("scale"),
    )
    rowsq = comp.join(F.broadcast(sc), "pos").select(
        "pos",
        "val",
        "vmin",
        "vmax",
        "scale",
        F.least(
            F.lit(255).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.floor(((F.col("val") - F.col("vmin")) / F.col("scale")) + F.lit(0.5)).cast("long"),
            ),
        ).alias("qv"),
    )
    errs = rowsq.withColumn(
        "err", (F.col("vmin") + (F.col("qv").cast("double") * F.col("scale"))) - F.col("val")
    )
    return (
        errs.groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("n_vals"),
            F.floor((F.min("vmin") * F.lit(1e9)) + F.lit(0.5)).cast("long").alias("min_e9"),
            F.floor((F.min("vmax") * F.lit(1e9)) + F.lit(0.5)).cast("long").alias("max_e9"),
            F.floor((F.min("scale") * F.lit(1e12)) + F.lit(0.5)).cast("long").alias("scale_e12"),
            F.sum(F.when(F.col("qv") == 0, 1).otherwise(0)).cast("long").alias("n_lo"),
            F.sum(F.when(F.col("qv") == 255, 1).otherwise(0)).cast("long").alias("n_hi"),
            F.sum(
                F.floor(((F.col("err") * F.col("err")) * F.lit(1e12)) + F.lit(0.5)).cast("long")
            ).cast("long").alias("sse_e12"),
        )
        .orderBy("pos")
    )


# ---------------------------------------------------------------- pca


def _pca_oracle_sql() -> str:
    """Unrolled DuckDB twin of the power iteration: the covariance CTEs
    plus _PCA_K matvec rounds, each an ordered list fold."""
    d1 = _D + 1
    matvec_rounds = []
    for t in range(_PCA_K):
        matvec_rounds.append(
            f"""v{t + 1} AS (
      SELECT list(s ORDER BY j) AS v FROM (
        SELECT c.j AS j,
               list_reduce(list_transform(range(1, {d1}), i -> c.rlist[i] * v{t}.v[i]),
                           (a, b) -> a + b) AS s
        FROM covrows c, v{t}
      )
    )"""
        )
    rounds_sql = ",\n    ".join(matvec_rounds)
    return f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor((x * CAST(1e6 AS DOUBLE)) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS qv
      FROM embeddings
    ),
    comp AS (
      SELECT vec_id, r.j, qv[r.j] AS qj
      FROM q CROSS JOIN (SELECT unnest(range(1, {d1})) AS j) r
    ),
    sums AS (
      SELECT j, sum(qj) AS sj, count(*) AS n FROM comp GROUP BY j
    ),
    gram AS (
      SELECT a.j AS j, b.j AS k, sum(a.qj * b.qj) AS g
      FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.j <= b.j
      GROUP BY a.j, b.j
    ),
    tri AS (
      SELECT g.j, g.k,
             CAST(CAST(sj.n AS HUGEINT) * g.g
                  - CAST(sj.sj AS HUGEINT) * CAST(sk.sj AS HUGEINT) AS DOUBLE)
             / ((CAST(sj.n AS DOUBLE) * CAST(sj.n AS DOUBLE)) * CAST(1e12 AS DOUBLE)) AS cov
      FROM gram g
      JOIN sums sj ON sj.j = g.j
      JOIN sums sk ON sk.j = g.k
    ),
    fullm AS (
      SELECT j, k, cov FROM tri
      UNION ALL
      SELECT k AS j, j AS k, cov FROM tri WHERE j < k
    ),
    covrows AS (
      SELECT j, list(cov ORDER BY k) AS rlist FROM fullm GROUP BY j
    ),
    v0 AS (
      SELECT list_transform(range(1, {d1}), x -> CAST(1 AS DOUBLE)) AS v
    ),
    {rounds_sql},
    nprev AS (
      SELECT sqrt(list_reduce(
               list_transform(range(1, {d1}), i -> v{_PCA_K - 1}.v[i] * v{_PCA_K - 1}.v[i]),
               (a, b) -> a + b)) AS nm
      FROM v{_PCA_K - 1}
    ),
    nlast AS (
      SELECT sqrt(list_reduce(
               list_transform(range(1, {d1}), i -> v{_PCA_K}.v[i] * v{_PCA_K}.v[i]),
               (a, b) -> a + b)) AS nm
      FROM v{_PCA_K}
    ),
    uvec AS (
      SELECT list_transform(range(1, {d1}), i -> v{_PCA_K}.v[i] / nlast.nm) AS u,
             nlast.nm / nprev.nm AS lam
      FROM v{_PCA_K}, nlast, nprev
    ),
    signed AS (
      SELECT CASE WHEN u[1] < CAST(0 AS DOUBLE)
                  THEN list_transform(u, x -> -x) ELSE u END AS u,
             lam
      FROM uvec
    )
    SELECT p.pos,
           CAST(floor((u[p.pos] * CAST(1e6 AS DOUBLE)) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS u_e6,
           CAST(floor((lam * CAST(1e9 AS DOUBLE)) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS lam_e9
    FROM signed CROSS JOIN (SELECT unnest(range(1, {d1})) AS pos) p
    ORDER BY p.pos
    """


def _fold_dot(a, b):
    """Ordered fold of sum_i a[i]*b[i] — the exact twin of DuckDB's
    list_reduce over list_transform (0.0-seeded fold == first-element
    seed because 0.0 + x == x)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@register("q_embed_pca", sql=_pca_oracle_sql())
def q_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding table by {K}-round
    power iteration over the exact covariance matrix, fully
    hash-oracled (see module docstring for the exactness design).
    Output: the unit top eigenvector (sign-fixed on its first
    component) in 1e-6 units plus the Rayleigh-quotient-style
    eigenvalue estimate ||C v_K|| / ||v_K-1|| in 1e-9 units.

    Scale shape: one corpus pass builds 2080 integer Gramian cells
    (partial aggs reduce each executor's slice to the cell count
    before the shuffle); everything after runs on d-sized frames."""
    em = load(spark, sf_dir, "embeddings", spread=True)
    qarr = em.select(
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor((x * F.lit(1e6)) + F.lit(0.5)).cast("long"),
        ).alias("qv")
    )

    # per-dimension exact integer sums
    comp = qarr.select(F.posexplode("qv").alias("j0", "qj")).select(
        (F.col("j0") + 1).alias("j"), "qj"
    )
    sums = comp.groupBy("j").agg(
        F.sum("qj").alias("sj"), F.count(F.lit(1)).alias("n")
    )

    # upper-triangle integer Gramian: 2080 products per row, exploded
    # then crushed by the partial hash agg
    prods = qarr.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.lit(_D)),
                    lambda j: F.transform(
                        F.sequence(j, F.lit(_D)),
                        lambda k: F.struct(
                            j.alias("j"),
                            k.alias("k"),
                            (F.element_at("qv", j) * F.element_at("qv", k)).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("c")
    ).select("c.j", "c.k", "c.p")
    gram = prods.groupBy("j", "k").agg(F.sum("p").alias("g"))

    # 128-bit covariance combine (r4 bridge), one double conversion
    sj = F.broadcast(sums.select("j", F.col("sj").alias("s_j"), "n"))
    sk = F.broadcast(sums.select(F.col("j").alias("k"), F.col("sj").alias("s_k")))
    dec = "decimal(38,0)"
    tri = (
        gram.join(sj, "j")
        .join(sk, "k")
        .select(
            "j",
            "k",
            (
                (
                    F.col("n").cast(dec) * F.col("g").cast(dec)
                    - F.col("s_j").cast(dec) * F.col("s_k").cast(dec)
                ).cast("double")
                / (
                    (F.col("n").cast("double") * F.col("n").cast("double"))
                    * F.lit(1e12)
                )
            ).alias("cov"),
        )
    )
    fullm = tri.unionByName(
        tri.where(F.col("j") < F.col("k")).select(
            F.col("k").alias("j"), F.col("j").alias("k"), "cov"
        )
    )
    covrows = scoped_persist(
        fullm.groupBy("j").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "cov"))),
                lambda s: s["cov"],
            ).alias("rlist")
        )
    )

    # power iteration over 64-row frames; each round is an ordered fold
    v = spark.range(1).select(
        F.array([F.lit(1.0)] * _D).alias("v")
    )
    for _ in range(_PCA_K - 1):
        v = (
            covrows.crossJoin(F.broadcast(v))
            .select("j", _fold_dot(F.col("rlist"), F.col("v")).alias("s"))
            .groupBy()
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "s"))),
                    lambda st: st["s"],
                ).alias("v")
            )
        )
    vprev = scoped_persist(v)  # v_{K-1}: referenced by v_K and by its own norm
    vlast = (
        covrows.crossJoin(F.broadcast(vprev))
        .select("j", _fold_dot(F.col("rlist"), F.col("v")).alias("s"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "s"))),
                lambda st: st["s"],
            ).alias("v")
        )
    )

    nprev = vprev.select(F.sqrt(_fold_dot(F.col("v"), F.col("v"))).alias("nm_prev"))
    u = (
        vlast.select(
            "v", F.sqrt(_fold_dot(F.col("v"), F.col("v"))).alias("nm_last")
        )
        .crossJoin(nprev)
        .select(
            F.transform(F.col("v"), lambda x: x / F.col("nm_last")).alias("u"),
            (F.col("nm_last") / F.col("nm_prev")).alias("lam"),
        )
        .select(
            F.when(
                F.element_at("u", 1) < F.lit(0.0),
                F.transform(F.col("u"), lambda x: -x),
            )
            .otherwise(F.col("u"))
            .alias("u"),
            "lam",
        )
    )
    return (
        u.select(F.posexplode("u").alias("pos0", "uval"), "lam")
        .select(
            (F.col("pos0") + 1).alias("pos"),
            F.floor((F.col("uval") * F.lit(1e6)) + F.lit(0.5)).cast("long").alias("u_e6"),
            F.floor((F.col("lam") * F.lit(1e9)) + F.lit(0.5)).cast("long").alias("lam_e9"),
        )
        .orderBy("pos")
    )
