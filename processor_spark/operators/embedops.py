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
  (exact Python ints <-> DuckDB HUGEINT — the r4 bridge) before ONE
  conversion to double.  Power iteration runs in a single-task
  kernel over the 2146 merged cells with 0.0-seeded left folds — the
  same fold order as the oracle's list_reduce-over-list_transform —
  and +, *, /, sqrt, floor are correctly rounded identically in
  CPython and both engines, so the doubles are bit-identical end to
  end.

Scale shape: quantization is explode -> two hash aggs with a 64-row
broadcast join back (partial aggs crush the exploded stream
map-side); the Gramian is an Arrow-batched numpy int64 X^T X kernel
whose partials merge map-side (<= 2146 cells per executor slice
before the one shuffle) — the same map-side-combine story as the
sketch tier.  The eigensolve touches only the cell table.

No reference implementation exists (/root/reference is a README
stub); semantics follow standard affine quantization (e.g. the
ONNX/TFLite uint8 scheme) and textbook power iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def _gram_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer Gramian of the embedding table as merged cells:
    (j, k, v) with j,k >= 1 the upper-triangle sum(q_j * q_k), k = 0
    the per-dim sums, j = k = 0 the row count.  Factored out so the
    plan test can assert the two-phase agg shape directly."""
    em = load(spark, sf_dir, "embeddings", spread=True)

    # Arrow-batched numpy kernel: each batch contributes one partial
    # integer Gramian (int64 X^T X — exact, and ~10x the throughput of
    # a 2080-struct explode per row: 8x-probe ratio fell 4.95 -> see
    # SCALE.md), per-dim sums (k=0 rows) and the row count (j=k=0
    # row); the downstream hash agg merges partials map-side, so the
    # shuffle carries <= 2146 cells per batch at any corpus size.
    # Quantization in the kernel is the same IEEE double expression
    # the engines evaluate (float32 -> float64 is exact; *1e6, +0.5,
    # floor are bit-identical), so the oracle's integers match.
    def _gram_partials(batches):
        import numpy as np
        import pandas as pd

        ju, ku = np.triu_indices(_D)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.floor((x * 1e6) + 0.5).astype(np.int64)
            g = q.T @ q
            sj = q.sum(axis=0, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "j": np.concatenate([ju + 1, np.arange(1, _D + 1), [0]]),
                    "k": np.concatenate([ku + 1, np.zeros(_D, np.int64), [0]]),
                    "v": np.concatenate([g[ju, ku], sj, [len(pdf)]]),
                }
            )

    cells = em.select("embedding").mapInPandas(
        _gram_partials, "j int, k int, v long"
    )
    return cells.groupBy("j", "k").agg(F.sum("v").alias("v"))


def _eigen_kernel(pdf):
    """Single-task eigensolve over the 2146 merged Gramian cells: the
    128-bit covariance combine, _PCA_K power-iteration rounds and the
    final normalization, every float op spelled as the IDENTICAL IEEE
    double expression the DuckDB oracle evaluates (Python ints are
    exact like HUGEINT; float(int), +, *, /, math.sqrt and math.floor
    are all correctly rounded the same way on both engines — CLAUDE.md
    engine-exact-float rules).  The fold order is the 0.0-seeded left
    fold both oracle twins use."""
    import math

    import pandas as pd

    cell = {
        (int(j), int(k)): int(v)
        for j, k, v in zip(pdf["j"], pdf["k"], pdf["v"])
    }
    n = cell[(0, 0)]
    s = [cell[(j, 0)] for j in range(1, _D + 1)]
    nd = float(n)
    denom = (nd * nd) * 1e12
    cov = [[0.0] * _D for _ in range(_D)]
    for j in range(1, _D + 1):
        for k in range(j, _D + 1):
            c = float(n * cell[(j, k)] - s[j - 1] * s[k - 1]) / denom
            cov[j - 1][k - 1] = c
            cov[k - 1][j - 1] = c

    v = [1.0] * _D
    for _ in range(_PCA_K):
        vprev = v
        v = []
        for row in cov:
            acc = 0.0
            for a, b in zip(row, vprev):
                acc = acc + (a * b)
            v.append(acc)

    def _norm(vec):
        acc = 0.0
        for x in vec:
            acc = acc + (x * x)
        return math.sqrt(acc)

    nm_last, nm_prev = _norm(v), _norm(vprev)
    u = [x / nm_last for x in v]
    if u[0] < 0.0:
        u = [-x for x in u]
    lam = nm_last / nm_prev
    lam_e9 = int(math.floor((lam * 1e9) + 0.5))
    return pd.DataFrame(
        {
            "pos": range(1, _D + 1),
            "u_e6": [int(math.floor((x * 1e6) + 0.5)) for x in u],
            "lam_e9": [lam_e9] * _D,
        }
    )


@register("q_embed_pca", sql=_pca_oracle_sql())
def q_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding table by {K}-round
    power iteration over the exact covariance matrix, fully
    hash-oracled (see module docstring for the exactness design).
    Output: the unit top eigenvector (sign-fixed on its first
    component) in 1e-6 units plus the Rayleigh-quotient-style
    eigenvalue estimate ||C v_K|| / ||v_K-1|| in 1e-9 units.

    Scale shape: the corpus pass reduces to <= 2146 integer Gramian
    cells per executor slice before the one shuffle; the d x d
    eigensolve is a single-task kernel over those cells (engine-side
    variants — per-round crossJoin/groupBy, or chained projections
    with per-round localCheckpoints — measured 3-11 s of pure job/
    stage overhead at sf0.1 vs ~1 s for this shape; the values are
    bit-identical either way)."""
    cells = _gram_cells(spark, sf_dir)
    return (
        cells.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(
            lambda _key, pdf: _eigen_kernel(pdf),
            "pos int, u_e6 long, lam_e9 long",
        )
        .orderBy("pos")
    )


# ---------------------------------------------------------------- outliers

_OUT_K = 20  # outliers returned


@register(
    "q_embed_outliers",
    sql=f"""
    WITH q AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS x,
             list_transform(CAST(embedding AS DOUBLE[]),
               v -> CAST(floor((v * CAST(1e6 AS DOUBLE)) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS qv
      FROM embeddings
    ),
    comp AS (
      SELECT r.j, qv[r.j] AS qj
      FROM q CROSS JOIN (SELECT unnest(range(1, {_D + 1})) AS j) r
    ),
    st AS (
      SELECT j, sum(qj) AS sj, sum(qj * qj) AS gjj, count(*) AS n
      FROM comp GROUP BY j
    ),
    mv AS (
      SELECT j,
             CAST(sj AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(1e6 AS DOUBLE)) AS mu,
             CAST(CAST(n AS HUGEINT) * gjj - CAST(sj AS HUGEINT) * CAST(sj AS HUGEINT) AS DOUBLE)
               / ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * CAST(1e12 AS DOUBLE)) AS var
      FROM st
    ),
    stats AS (
      SELECT list(mu ORDER BY j) AS mu, list(var ORDER BY j) AS var FROM mv
    ),
    scored AS (
      SELECT vec_id, label,
             list_reduce(
               list_transform(range(1, {_D + 1}),
                 i -> coalesce(((x[i] - s.mu[i]) * (x[i] - s.mu[i]))
                               / nullif(s.var[i], CAST(0 AS DOUBLE)),
                               CAST(0 AS DOUBLE))),
               (a, b) -> a + b) AS score
      FROM q, stats s
    )
    SELECT vec_id, label,
           CAST(floor((score * CAST(1e6 AS DOUBLE)) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS score_e6
    FROM scored
    ORDER BY score_e6 DESC, vec_id LIMIT {_OUT_K}
    """,
)
def q_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} embedding anomalies by diagonal-Mahalanobis score
    (sum over dims of (x - mu)^2 / var) — the cheap outlier sweep a
    pipeline runs to quarantine corrupt or out-of-distribution
    vectors before indexing.  Per-dim mean/variance come from the
    exact integer Gramian cells (diagonal + sums — reuses the
    q_embed_pca kernel; 128-bit combine, one double conversion); the
    per-vector score is the 0.0-seeded left fold both engines
    evaluate identically, and the top-k sort key is the ROUNDED score
    (CLAUDE.md arg-max rule).  Scale shape: the stats pass reduces
    map-side to cells; the scoring pass is one narrow map + a
    TakeOrdered top-k — no shuffle of raw vectors anywhere."""
    cells = _gram_cells(spark, sf_dir)
    diag = cells.where((F.col("j") > 0) & (F.col("j") == F.col("k"))).select(
        "j", F.col("v").alias("gjj")
    )
    sums = cells.where((F.col("j") > 0) & (F.col("k") == 0)).select(
        "j", F.col("v").alias("sj")
    )
    nrow = cells.where(F.col("j") == 0).select(F.col("v").alias("n"))
    dec = "decimal(38,0)"
    mv = (
        diag.join(sums, "j")
        .crossJoin(F.broadcast(nrow))
        .select(
            "j",
            (
                F.col("sj").cast("double")
                / (F.col("n").cast("double") * F.lit(1e6))
            ).alias("mu"),
            (
                (
                    F.col("n").cast(dec) * F.col("gjj").cast(dec)
                    - F.col("sj").cast(dec) * F.col("sj").cast(dec)
                ).cast("double")
                / (
                    (F.col("n").cast("double") * F.col("n").cast("double"))
                    * F.lit(1e12)
                )
            ).alias("var"),
        )
    )
    stats = mv.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "mu"))), lambda s: s["mu"]
        ).alias("mu"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "var"))), lambda s: s["var"]
        ).alias("var"),
    )
    em = load(spark, sf_dir, "embeddings", spread=True).withColumn(
        "x", F.col("embedding").cast("array<double>")
    )
    def term(i):
        # var=0 (constant dimension) is skipped identically on both
        # engines: nullif -> NULL division -> coalesce 0.0 (ADVICE r7).
        return F.coalesce(
            (
                (F.element_at("x", i) - F.element_at("mu", i))
                * (F.element_at("x", i) - F.element_at("mu", i))
            )
            / F.nullif(F.element_at("var", i), F.lit(0.0)),
            F.lit(0.0),
        )

    score = F.aggregate(
        F.transform(F.sequence(F.lit(1), F.lit(_D)), term),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    return (
        em.crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            "label",
            F.floor((score * F.lit(1e6)) + F.lit(0.5)).cast("long").alias("score_e6"),
        )
        .orderBy(F.desc("score_e6"), F.asc("vec_id"))
        .limit(_OUT_K)
    )


# ------------------------------------------------------------ pc1 stats

from processor_spark import registry as _registry_mod

_PC1_SQL = f"""
    WITH pca AS ({_pca_oracle_sql()}),
    u AS (
      SELECT list(u_e6 ORDER BY pos) AS u FROM pca
    ),
    qv AS (
      SELECT label,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor((x * CAST(1e6 AS DOUBLE)) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS q
      FROM embeddings
    ),
    proj AS (
      SELECT label,
             list_reduce(list_transform(range(1, {_D + 1}), i -> q[i] * u.u[i]),
                         (a, b) -> a + b) AS p
      FROM qv, u
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(p) // count(*) AS BIGINT) AS mean_p,
           CAST(min(p) AS BIGINT) AS min_p,
           CAST(max(p) AS BIGINT) AS max_p
    FROM proj GROUP BY label ORDER BY label
"""


@register("q_embed_pc1_stats", sql=_PC1_SQL)
def q_embed_pc1_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label statistics of the projection onto the learned first
    principal component — the one-dimensional separability check a
    pipeline runs after PCA (labels whose projection ranges overlap
    are not linearly separated along PC1).  Composes q_embed_pca:
    projections use the ROUNDED 1e-6 eigenvector, so p = sum q_i*u_i
    is an exact integer on both engines (the oracle embeds the full
    PCA SQL as a CTE — the q_ann_recall composition pattern), and the
    per-label mean is one integer division.  Scale shape: the PCA
    cell pass plus one narrow projection map and a hash agg; the
    eigenvector is a broadcast single row."""
    u_arr = (
        q_embed_pca(spark, sf_dir)
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "u_e6"))),
                lambda s: s["u_e6"],
            ).alias("u")
        )
    )
    qv = load(spark, sf_dir, "embeddings", spread=True).select(
        "label",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor((x * F.lit(1e6)) + F.lit(0.5)).cast("long"),
        ).alias("q"),
    )
    proj = qv.crossJoin(F.broadcast(u_arr)).select(
        "label",
        F.aggregate(
            F.zip_with("q", "u", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("p"),
    )
    return (
        proj.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.expr("CAST(sum(p) div count(*) AS BIGINT)").alias("mean_p"),
            F.min("p").cast("long").alias("min_p"),
            F.max("p").cast("long").alias("max_p"),
        )
        .orderBy("label")
    )
