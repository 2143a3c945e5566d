"""UDF / UDAF / UDTF surface (SURVEY.md §2.11).

Policy: built-in expressions > pandas UDF > plain UDF.  Everything in
the engine's relational paths is built-in (asserted by
tests/test_plans.py::test_no_python_udf_in_relational_paths); this
module holds the sanctioned Python-boundary escapes, each used only
where Spark genuinely lacks the primitive:

- scalar pandas UDF  : unit-normalize an embedding (Arrow-vectorized,
  whole-column numpy math — the approved shape for custom numerics)
- grouped UDAF       : median absolute deviation via applyInPandas
  (no Spark built-in MAD; DuckDB has mad() → SQL-oracled!)
- Python UDTF        : character-n-gram expansion as a true table
  function (lateral-join shape)

Each documents why a built-in doesn't cover it, per the §2.11 rule.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from processor_spark.registry import register
from processor_spark.sources import load


# ---------------------------------------------------------------- scalar pandas UDF
@F.pandas_udf(T.ArrayType(T.DoubleType()))
def unit_normalize(emb: pd.Series) -> pd.Series:
    """L2-normalize embeddings batch-wise (Arrow in, numpy math, Arrow out).

    Exists as a pandas UDF deliberately: the equivalent built-in
    (transform(x -> x / sqrt(aggregate(...)))) recomputes the norm per
    element; the vectorized form is the idiomatic escape hatch.
    """
    import numpy as np

    def norm_one(v):
        a = np.asarray(v, dtype="float64")
        n = np.linalg.norm(a)
        return (a / n if n else a).tolist()

    return emb.map(norm_one)


@register(
    "q_udf_normalize",
    sql="""
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), normed AS (
      SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM vecs
    )
    SELECT vec_id,
           array_to_string(
             list_transform(v, x -> CAST(round(
               (CASE WHEN nrm = 0 THEN x ELSE x / nrm END) * 1000000, 0) AS BIGINT)),
             ',') AS unit_micro,
           round(sqrt(list_sum(list_transform(v,
             x -> (CASE WHEN nrm = 0 THEN x ELSE x / nrm END)
                * (CASE WHEN nrm = 0 THEN x ELSE x / nrm END)))), 6) AS unit_norm
    FROM normed
    """,
)
def q_udf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-normalized embeddings via the Arrow-batched pandas UDF, with
    a FULL SQL oracle: each normalized component is scaled to integer
    micro-units (round(x·1e6)) and CSV-serialized, so the Python
    boundary itself — Arrow transfer, numpy math, Arrow return — is
    value-hash-verified against DuckDB's pure-SQL normalization, not
    just row-counted.  The norm-check column (≈1.0) rides along."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    normed = e.select(
        "vec_id", unit_normalize(F.col("embedding").cast("array<double>")).alias("unit")
    )
    sq = F.aggregate(F.col("unit"), F.lit(0.0), lambda a, x: a + x * x)
    return normed.select(
        "vec_id",
        F.array_join(
            F.transform(F.col("unit"), lambda x: F.round(x * 1000000, 0).cast("bigint")),
            ",",
        ).alias("unit_micro"),
        F.round(F.sqrt(sq), 6).alias("unit_norm"),
    )


# ---------------------------------------------------------------- grouped UDAF
MAD_SCHEMA = T.StructType(
    [
        T.StructField("o_orderpriority", T.StringType()),
        T.StructField("mad_price", T.DoubleType()),
        T.StructField("n_orders", T.LongType()),
    ]
)


def _mad(pdf: pd.DataFrame) -> pd.DataFrame:
    med = pdf["o_totalprice"].median()
    mad = (pdf["o_totalprice"] - med).abs().median()
    return pd.DataFrame(
        {
            "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
            "mad_price": [round(float(mad), 4)],
            "n_orders": [len(pdf)],
        }
    )


@register(
    "q_udaf_mad",
    sql="""
    SELECT o_orderpriority,
           round(mad(o_totalprice), 4) AS mad_price,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_udaf_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of order value per priority.

    Spark has no built-in MAD (two dependent medians), so this is the
    canonical applyInPandas UDAF: full-group pandas function with an
    explicit output schema.  DuckDB's native mad() oracles it — a
    Python-boundary operator still under the full SQL hash check.
    Scale note: whole-group-in-memory is the applyInPandas contract;
    with ~5 priority groups one group ≈ 1/5 of the table, so at 100 TB
    this exact formulation does NOT fly — the scale path is two passes
    of approx_percentile (median, then median of |x − med|, both
    Greenwald–Khanna sketches, fully mergeable), or the GROUPED_AGG
    shape of q_udaf_trimmed when a bounded-error rank statistic is
    acceptable.  This key exists to demonstrate the exact-UDAF
    boundary under the hash check; q_percentiles carries the sketch
    path.
    """
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderpriority", "o_totalprice").groupBy("o_orderpriority").applyInPandas(
        _mad, MAD_SCHEMA
    )


# ---------------------------------------------------------------- Python UDTF
class CharNgrams:
    """UDTF: expand a string into its distinct character 3-grams.

    A *table* function (one input row → N output rows with their own
    schema) — the explode built-in covers array expansion, but a UDTF
    carries per-row Python logic + multi-column output; this is the
    minimal honest use."""

    def eval(self, doc_id: int, text: str):  # noqa: D102
        if not text:
            return
        seen = set()
        compact = text.replace(" ", "_")
        for i in range(len(compact) - 2):
            g = compact[i : i + 3]
            if g not in seen:
                seen.add(g)
                yield doc_id, g, i

    def terminate(self):  # noqa: D102
        return


def char_ngrams_udtf():
    from pyspark.sql.functions import udtf

    return udtf(CharNgrams, returnType="doc_id bigint, gram string, first_pos int")


@register(
    "q_udtf_ngrams",
    sql="""
    SELECT doc_id,
           CAST(len(list_distinct(list_transform(
                range(1, len(replace(text, ' ', '_')) - 1),
                i -> substr(replace(text, ' ', '_'), CAST(i AS INTEGER), 3)
           ))) AS BIGINT) AS n_grams,
           CAST(0 AS INTEGER) AS min_pos
    FROM documents
    WHERE doc_id <= 50 AND len(replace(text, ' ', '_')) >= 3
    """,
)
def q_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct char-3-gram count per document via a lateral UDTF join —
    with a full SQL oracle (DuckDB re-derives the distinct-gram count
    relationally), so the Python UDTF boundary is value-hash-verified
    like the pandas-UDF (q_udf_normalize) and UDTF-chunk
    (q_udtf_chunks) paths.  min(first_pos) is 0 by construction for any
    text of length ≥ 3; the oracle states that constant."""
    ngrams = char_ngrams_udtf()
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 50)
    out = d.lateralJoin(ngrams(F.col("doc_id").outer(), F.col("text").outer()))
    return (
        out.groupBy(d.doc_id)
        .agg(F.count(F.lit(1)).alias("n_grams"), F.min("first_pos").alias("min_pos"))
    )


@register(
    "q_udtf_chunks",
    sql="""
    SELECT doc_id, u.s // 32 + 1 AS chunk_idx,
           array_to_string(array_slice(toks, u.s + 1, u.s + 32), ' ') AS piece
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         unnest(range(0, len(toks), 32)) AS u(s)
    """,
)
def q_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A TRUE Python UDTF (Spark 4 `@udtf`, §2.11) splitting each
    document into non-overlapping 32-token pieces via a lateral join —
    and still carrying the full SQL value-hash oracle: the Python
    generator's output must byte-match DuckDB's relational slicing.
    The UDTF is the row-expanding escape hatch for logic a lambda
    can't express (stateful per-row expansion, external tokenizers);
    for THIS particular job the built-in path (q_text_chunks) is
    preferred at scale — this key exists to prove the boundary is
    correct, not to recommend it."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: int, piece: string")
    class Chunker:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(0, len(toks), 32):
                yield i // 32 + 1, " ".join(toks[i : i + 32])

    d = load(spark, sf_dir, "documents")
    out = d.lateralJoin(Chunker(F.col("text").outer()))
    return out.select("doc_id", "chunk_idx", "piece")


# ---------------------------------------------------------------- GROUPED_AGG pandas UDF
# (type OBJECT, not the DDL string "long": parsing a DDL return type at
# import time requires an active session, and operator modules import
# session-free)
@F.pandas_udf(T.LongType())
def trimmed_mean_cc(v: pd.Series) -> int:
    """GROUPED_AGG pandas UDF: 10%-per-tail rank-trimmed mean, in exact
    integer centi-cents ((sum_of_kept_cents * 100) // n_kept).

    The fourth UDF shape §2.11 names (scalar / grouped-map / UDTF are
    above): a Series→scalar aggregate usable in groupBy().agg() AND
    over a Window — which grouped-map applyInPandas is not.  Exists as
    a UDF because Spark has no trimmed/robust mean built-in; the
    arithmetic is integer-exact end-to-end (floor(x*100+0.5) cents,
    Python bigint sum, floor division), so the SQL oracle re-derives
    the identical value with row_number trimming — no float rounding
    can diverge (CLAUDE.md integer-micro-unit rule).
    """
    import numpy as np

    cents = np.floor(v.to_numpy(dtype="float64") * 100 + 0.5).astype("int64")
    cents.sort()
    k = len(cents) // 10
    kept = cents[k : len(cents) - k]
    return int(kept.sum()) * 100 // len(kept)


# Spark refuses to mix a GROUPED_AGG pandas UDF with built-in aggregate
# functions in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row
# count rides as a second pandas aggregate.
@F.pandas_udf(T.LongType())
def count_rows(v: pd.Series) -> int:  # noqa: D103
    return len(v)


@register(
    "q_udaf_trimmed",
    sql="""
    WITH ranked AS (
      SELECT o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(sum(cents) FILTER (WHERE rn > n // 10 AND rn <= n - n // 10) * 100
                // count(*) FILTER (WHERE rn > n // 10 AND rn <= n - n // 10)
                AS BIGINT) AS trimmed_mean_cc,
           count(*) AS n_orders
    FROM ranked
    GROUP BY o_orderpriority
    """,
)
def q_udaf_trimmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (10%-trimmed) mean order value per priority via the
    GROUPED_AGG pandas UDF — the window-compatible custom-aggregate
    shape (tests/test_api.py proves the same UDF runs `.over(Window)`).
    Full SQL oracle: DuckDB trims by row_number rank and repeats the
    exact integer arithmetic, hash-verifying the Arrow
    grouped-aggregate boundary itself."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderpriority", "o_totalprice")
        .groupBy("o_orderpriority")
        .agg(
            trimmed_mean_cc("o_totalprice").alias("trimmed_mean_cc"),
            count_rows("o_totalprice").alias("n_orders"),
        )
    )


N_SPLIT_COLS = 4


def split_fixed_udtf():
    """Polymorphic UDTF (Spark 4 `analyze()` static method): the output
    schema is COMPUTED AT PLAN TIME from the constant column-count
    argument — the API surface behind pivot-like / parser UDTFs whose
    shape depends on configuration, not a hard-coded returnType."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    class SplitFixed:
        @staticmethod
        def analyze(doc_id, text, n):
            from pyspark.sql.udtf import AnalyzeResult

            width = int(n.value)
            return AnalyzeResult(
                schema=StructType(
                    [StructField("doc_id", LongType())]
                    + [StructField(f"tok{i}", StringType()) for i in range(width)]
                )
            )

        def eval(self, doc_id, text, n):
            import re

            # ASCII whitespace ONLY: str.split() also splits on Unicode
            # whitespace (U+00A0 etc.) that DuckDB's \s does not match —
            # keep the one tokenizer definition the whole repo uses
            toks = [t for t in re.split("[ \t\n\r\f\v]+", text or "") if t]
            if len(toks) >= n:
                yield tuple([doc_id] + toks[:n])

    return udtf(SplitFixed)


@register(
    "q_udtf_analyze",
    sql=rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents
    )
    SELECT doc_id,
           {", ".join(f"t[{i + 1}] AS tok{i}" for i in range(N_SPLIT_COLS))}
    FROM toks WHERE len(t) >= {N_SPLIT_COLS}
    """,
)
def q_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-polymorphic UDTF — `analyze()` derives the output columns
    (tok0..tok{N_SPLIT_COLS - 1}) from the constant width argument at
    PLAN time, so one UDTF class serves any configuration without
    string-typed escape hatches; rows with fewer tokens are filtered
    inside eval, matching the oracle's length predicate.  The oracle
    byte-matches the Python tokenizer against DuckDB's relational
    split, proving the Arrow boundary AND the dynamic schema.

    Scale shape: lateral UDTF over a pruned 2-column scan; Python-side
    work is a whitespace split per row (the sanctioned escape-hatch
    tier — a built-in split does this job at scale, as with
    q_udtf_chunks)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    fn = split_fixed_udtf()
    out = d.lateralJoin(
        fn(F.col("doc_id").outer(), F.col("text").outer(), F.lit(N_SPLIT_COLS))
    )
    return out.select(
        d.doc_id, *[F.col(f"tok{i}") for i in range(N_SPLIT_COLS)]
    )
