"""Retrieval-quality evaluation — NDCG@10 and MAP/MRR@10 over a
deterministic dense-retrieval run, with FULL cross-engine hash
oracles.

A training-data pipeline that builds retrieval indexes (the ANN tier,
similarity.py) needs the matching *evaluation* tier: given a query
set, a candidate pool and relevance judgments, score the ranked run
with the standard ranking metrics.  The run here is brute-force
dot-product retrieval over the embeddings fixture (queries = every
40th vector, judged by label agreement), which makes the whole
pipeline deterministic and therefore fully hash-oracle-able.

Exactness strategy (the repo's integerization playbook, CLAUDE.md):

- the dot product is a 0.0-seeded left fold on the Spark side and a
  first-element-seeded ``list_reduce`` on the DuckDB side — the
  ``(0.0 + x) == x`` bridge makes the doubles bit-identical — then
  integerized to ``score_e6`` so ranking ties are impossible to
  mis-order (rank on ``(score_e6 DESC, vec_id)``).
- NDCG's position discounts ``1/log2(i+1)`` are transcendental, but
  the position domain is 1..10 — so the weights are computed ONCE in
  Python and embedded as *integer* literals ``W_i =
  round(1e12/log2(i+1))``; DCG and ideal-DCG are then exact int64
  sums ``Σ rel_i · W_i`` (≤ 3e13, no overflow), with ONE float
  division at the end (identical IEEE on both engines).
- AP@10's rationals all have denominators dividing lcm(1..10)=2520:
  ``P@k = hits/k`` contributes the exact integer ``(2520 div k) ·
  hits``, so the AP numerator is an exact int64 and the single
  division by ``2520 · min(R, 10)`` is again one float op.
  MRR uses the integer-division bridge (``1000000 div rank``).

Scale shape: the query set is a SAMPLE (every 40th vector — the way a
production eval runs against a fixed benchmark set), so the pairs
stage is |Q| × |corpus| with Q broadcast — embarrassingly parallel,
no shuffle until the per-query top-k window, which partitions by
query.  At 100 TB of corpus the same plan holds: broadcast the query
set, scan the corpus once, rank per query.

No reference implementation exists (/root/reference is a README
stub); metric definitions follow the standard IR formulations
(Järvelin & Kekäläinen's NDCG; TREC MAP/MRR).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_spark.registry import register
from processor_spark.sources import load

_D = 64  # embedding dimensionality (TESTDATA.md fixture contract)
_QMOD = 40  # queries = vec_id % _QMOD == 0 ...
_QCAP = 4000  # ... AND vec_id < _QCAP: the eval set is FIXED-SIZE
# (<= 100 queries) no matter how large the corpus grows — without the
# cap the pairs stage is |Q| x |corpus| with Q ~ corpus/40, i.e.
# quadratic at 100 TB; a benchmark query set never scales with the
# candidate pool.
_K = 10  # evaluation depth
_LCM = 2520  # lcm(1..10): common denominator for P@k rationals

# Integer discount weights: W_i = round(1e12 / log2(i + 1)), i = 1.._K.
# Computed once in Python; embedded identically in both engines.
_W = [round(1e12 / math.log2(i + 1)) for i in range(1, _K + 1)]
_W_SQL = "[" + ", ".join(str(w) for w in _W) + "]"


def _dot(a, b):
    def mul(x, y):
        return x * y

    def add(acc, x):
        return acc + x

    return F.aggregate(F.zip_with(a, b, mul), F.lit(0.0), add)


# Shared ranked-run CTEs: queries × candidates, integerized dot-product
# score, retrieval rank and ideal (relevance-sorted) rank per query.
_RUN_CTES = f"""
    qs AS (
      SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb,
             label AS q_label
      FROM embeddings WHERE vec_id % {_QMOD} = 0 AND vec_id < {_QCAP}
    ), pairs AS (
      SELECT q.q_id, c.vec_id, q.q_label, c.label,
             CAST(floor((list_reduce(
                    list_transform(range(1, {_D + 1}),
                                   i -> q.q_emb[i] * CAST(c.embedding AS DOUBLE[])[i]),
                    (x, y) -> x + y) * CAST(1e6 AS DOUBLE))
                  + CAST(0.5 AS DOUBLE)) AS BIGINT) AS score_e6
      FROM qs q JOIN embeddings c ON c.vec_id <> q.q_id
    ), graded AS (
      SELECT q_id, vec_id, score_e6,
             CASE WHEN q_label = label THEN
               CASE WHEN (q_id % 3) = (vec_id % 3) THEN 3 ELSE 1 END
             ELSE 0 END AS rel3,
             CASE WHEN q_label = label THEN 1 ELSE 0 END AS rel1
      FROM pairs
    ), ranked AS (
      SELECT q_id, vec_id, score_e6, rel3, rel1,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score_e6 DESC, vec_id) AS rnk,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY rel3 DESC, vec_id) AS irnk
      FROM graded
    )"""


def _ranked_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    em = load(spark, sf_dir, "embeddings")
    qs = (
        em.where((F.col("vec_id") % _QMOD == 0) & (F.col("vec_id") < _QCAP))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").cast("array<double>").alias("q_emb"),
            F.col("label").alias("q_label"),
        )
    )
    pairs = (
        em.join(F.broadcast(qs), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "q_label",
            "label",
            F.floor(
                (_dot(F.col("q_emb"), F.col("embedding").cast("array<double>")) * F.lit(1e6))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("score_e6"),
        )
    )
    graded = pairs.select(
        "q_id",
        "vec_id",
        "score_e6",
        F.when(
            F.col("q_label") == F.col("label"),
            F.when((F.col("q_id") % 3) == (F.col("vec_id") % 3), F.lit(3)).otherwise(F.lit(1)),
        )
        .otherwise(F.lit(0))
        .alias("rel3"),
        F.when(F.col("q_label") == F.col("label"), F.lit(1)).otherwise(F.lit(0)).alias("rel1"),
    )
    w_rnk = Window.partitionBy("q_id").orderBy(F.col("score_e6").desc(), F.col("vec_id"))
    w_irnk = Window.partitionBy("q_id").orderBy(F.col("rel3").desc(), F.col("vec_id"))
    return graded.select(
        "q_id",
        "vec_id",
        "score_e6",
        "rel3",
        "rel1",
        F.row_number().over(w_rnk).alias("rnk"),
        F.row_number().over(w_irnk).alias("irnk"),
    )


# ---------------------------------------------------------------- NDCG


@register(
    "q_ndcg",
    sql=f"""
    WITH {_RUN_CTES}
    SELECT q_id,
           CAST(count(*) AS BIGINT) AS n_cand,
           CAST(sum(CASE WHEN rnk <= {_K}
                         THEN rel3 * ({_W_SQL})[rnk] ELSE 0 END) AS BIGINT) AS dcg_e12,
           CAST(sum(CASE WHEN irnk <= {_K}
                         THEN rel3 * ({_W_SQL})[irnk] ELSE 0 END) AS BIGINT) AS idcg_e12,
           CASE WHEN sum(CASE WHEN irnk <= {_K}
                              THEN rel3 * ({_W_SQL})[irnk] ELSE 0 END) > 0
                THEN CAST(floor((CAST(sum(CASE WHEN rnk <= {_K}
                                            THEN rel3 * ({_W_SQL})[rnk] ELSE 0 END) AS DOUBLE)
                                 / CAST(sum(CASE WHEN irnk <= {_K}
                                            THEN rel3 * ({_W_SQL})[irnk] ELSE 0 END) AS DOUBLE)
                                 * CAST(1e6 AS DOUBLE)) + CAST(0.5 AS DOUBLE)) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS ndcg_e6
    FROM ranked
    GROUP BY q_id
    ORDER BY q_id
    """,
)
def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per query over the deterministic dense-retrieval run:
    graded relevance from label agreement, integer DCG via
    Python-precomputed ``round(1e12/log2(i+1))`` discount literals
    (the transcendental-over-a-finite-domain trick), one float
    division at the end.  Queries broadcast; the only shuffle is the
    per-query ranking window."""
    run = _ranked_run(spark, sf_dir)
    warr = F.array(*[F.lit(w) for w in _W])
    dcg_term = F.when(
        F.col("rnk") <= _K, F.col("rel3") * F.element_at(warr, F.col("rnk").cast("int"))
    ).otherwise(F.lit(0))
    idcg_term = F.when(
        F.col("irnk") <= _K, F.col("rel3") * F.element_at(warr, F.col("irnk").cast("int"))
    ).otherwise(F.lit(0))
    agg = run.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_cand"),
        F.sum(dcg_term).cast("long").alias("dcg_e12"),
        F.sum(idcg_term).cast("long").alias("idcg_e12"),
    )
    return agg.select(
        "q_id",
        "n_cand",
        "dcg_e12",
        "idcg_e12",
        F.when(
            F.col("idcg_e12") > 0,
            F.floor(
                (F.col("dcg_e12").cast("double") / F.col("idcg_e12").cast("double"))
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("ndcg_e6"),
    ).orderBy("q_id")


# ---------------------------------------------------------------- MAP / MRR


@register(
    "q_map_mrr",
    sql=f"""
    WITH {_RUN_CTES}
    , cut AS (
      SELECT q_id, vec_id, rnk, rel1,
             CAST(sum(rel1) OVER (PARTITION BY q_id ORDER BY rnk
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hits
      FROM ranked WHERE rnk <= {_K}
    ), perq AS (
      SELECT q_id,
             CAST(sum(CASE WHEN rel1 = 1
                           THEN ({_LCM} // rnk) * hits ELSE 0 END) AS BIGINT) AS ap_num,
             CAST(coalesce(min(CASE WHEN rel1 = 1 THEN rnk END), 0) AS BIGINT) AS first_hit
      FROM cut GROUP BY q_id
    ), rtot AS (
      SELECT q_id, CAST(sum(rel1) AS BIGINT) AS n_rel FROM ranked GROUP BY q_id
    )
    SELECT p.q_id, r.n_rel, p.first_hit,
           CASE WHEN p.first_hit > 0
                THEN CAST(1000000 // p.first_hit AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS rr_e6,
           CASE WHEN r.n_rel > 0
                THEN CAST(floor((CAST(p.ap_num AS DOUBLE)
                                 / CAST({_LCM} * least(r.n_rel, {_K}) AS DOUBLE)
                                 * CAST(1e6 AS DOUBLE)) + CAST(0.5 AS DOUBLE)) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS ap_e6
    FROM perq p JOIN rtot r USING (q_id)
    ORDER BY p.q_id
    """,
)
def q_map_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AP@10 and reciprocal rank per query (binary label relevance).
    Every P@k rational is scaled by lcm(1..10)=2520 into an exact
    int64 numerator; min(R,10) normalization and the final micro-unit
    conversion are the only float ops (identical trees both sides).
    MRR uses the integer-division bridge (Spark ``div`` == DuckDB
    ``//``)."""
    from pyspark.sql import Window

    run = _ranked_run(spark, sf_dir)
    cut = run.where(F.col("rnk") <= _K).select(
        "q_id",
        "vec_id",
        "rnk",
        "rel1",
        F.sum("rel1")
        .over(
            Window.partitionBy("q_id")
            .orderBy("rnk")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long")
        .alias("hits"),
    )
    perq = cut.groupBy("q_id").agg(
        F.sum(
            F.when(
                F.col("rel1") == 1,
                F.expr(f"({_LCM} div rnk)") * F.col("hits"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("ap_num"),
        F.coalesce(F.min(F.when(F.col("rel1") == 1, F.col("rnk"))), F.lit(0))
        .cast("long")
        .alias("first_hit"),
    )
    rtot = run.groupBy("q_id").agg(F.sum("rel1").cast("long").alias("n_rel"))
    return (
        perq.join(rtot, "q_id")
        .select(
            "q_id",
            "n_rel",
            "first_hit",
            F.when(
                F.col("first_hit") > 0, F.expr("CAST(1000000 div first_hit AS BIGINT)")
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("rr_e6"),
            F.when(
                F.col("n_rel") > 0,
                F.floor(
                    (
                        F.col("ap_num").cast("double")
                        / (F.lit(_LCM) * F.least(F.col("n_rel"), F.lit(_K))).cast("double")
                    )
                    * F.lit(1e6)
                    + F.lit(0.5)
                ).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("ap_e6"),
        )
        .orderBy("q_id")
    )
