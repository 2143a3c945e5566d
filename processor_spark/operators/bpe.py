"""BPE vocabulary induction over the document corpus — fully
hash-oracled.

The tokenizer-training step of an LLM data pipeline: learn the first K
byte-pair merges from corpus word frequencies.  The classic scale
trick (Sennrich et al. 2016 reference implementation) applies: the
corpus-sized work is ONE tokenize + word-count aggregation; every
merge round then operates on the capped word-frequency table (V rows),
so K rounds cost K tiny aggs regardless of corpus size — at 100 TB
the corpus pass is a map-side-combinable hash agg and the iteration
never touches raw data again.

Exactness design (everything is strings + integer counts — no floats
anywhere):
- words: ``[a-z]+`` runs of the lowercased text, length-bounded;
  vocab capped at the top V words with a total-order tie-break
  (count DESC, word ASC — the LIMIT rule).
- symbol representation: characters joined by single spaces via
  ``regexp_replace(word, '(.)', '$1 ')`` (Spark) ≡
  ``regexp_replace(word, '(.)', '\\1 ', 'g')`` (DuckDB).
- adjacent-pair counts are integer sums weighted by word count;
  the best pair per round is argmax with (count DESC, pair ASC).
- merge application is TWO literal ``replace`` passes over the
  space-padded representation (`` a b `` → `` ab ``): a single
  leftmost-non-overlapping pass can miss alternating chains
  (``a b a b`` — the consumed separator space hides the next match);
  after one pass the survivors are separated by merged tokens, so the
  second pass catches them all.  Both engines' ``replace`` is
  literal, replace-all, leftmost-non-overlapping, so the two-pass
  semantics are bit-identical.

The Spark iteration localCheckpoints the representation table each
round (V rows — cheap): each round references the previous table
twice (pair argmax + merge application), so an unchecked lineage
would double per round (CLAUDE.md iterative-loop rule).

No reference implementation exists (/root/reference is a README
stub); semantics follow the published BPE algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_spark.caching import scoped_persist
from processor_spark.registry import register
from processor_spark.sources import load

_V = 256  # vocab cap (top-V words by count, tie-break word ASC)
_K = 6  # merge rounds
_WMIN, _WMAX = 2, 16  # word length bounds


def _bpe_train_ctes() -> list:
    """Shared unrolled CTE chain: capped vocab, reps0 .. reps{K},
    per-round pair aggregation and argmax."""
    ctes = [
        f"""w AS (
      SELECT word, count(*) AS wcnt FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents
      ) WHERE length(word) BETWEEN {_WMIN} AND {_WMAX}
      GROUP BY word ORDER BY wcnt DESC, word LIMIT {_V}
    )""",
        r"""reps0 AS (
      SELECT word, wcnt, trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS rep
      FROM w
    )""",
    ]
    for k in range(1, _K + 1):
        p = k - 1
        ctes.append(
            f"""pairs{k} AS (
      SELECT pair, sum(wcnt) AS wsum FROM (
        SELECT wcnt,
               unnest(list_transform(range(1, len(string_split(rep, ' '))),
                 i -> string_split(rep, ' ')[i] || ' ' || string_split(rep, ' ')[i + 1])) AS pair
        FROM reps{p}
      ) GROUP BY pair
    )"""
        )
        ctes.append(
            f"""best{k} AS (
      SELECT pair, wsum FROM pairs{k} ORDER BY wsum DESC, pair LIMIT 1
    )"""
        )
        ctes.append(
            f"""reps{k} AS (
      SELECT r.word, r.wcnt,
             trim(replace(replace(' ' || r.rep || ' ',
                                  ' ' || b.pair || ' ',
                                  ' ' || replace(b.pair, ' ', '') || ' '),
                          ' ' || b.pair || ' ',
                          ' ' || replace(b.pair, ' ', '') || ' ')) AS rep
      FROM reps{p} r, best{k} b
    )"""
        )
    return ctes


def _bpe_oracle_sql() -> str:
    selects = "\n    UNION ALL\n    ".join(
        f"SELECT {k} AS step, pair AS merge_pair, replace(pair, ' ', '') AS merged, "
        f"CAST(wsum AS BIGINT) AS weight FROM best{k}"
        for k in range(1, _K + 1)
    )
    return (
        "WITH " + ",\n    ".join(_bpe_train_ctes()) + "\n    " + selects + "\n    ORDER BY step"
    )


def _bpe_apply_oracle_sql() -> str:
    """Training chain + application to the FULL word table + subtoken
    counts (top 20, total-order tie-break)."""
    ctes = _bpe_train_ctes()
    ctes.append(
        f"""wfull AS (
      SELECT word, count(*) AS wcnt FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents
      ) WHERE length(word) BETWEEN {_WMIN} AND {_WMAX}
      GROUP BY word
    )"""
    )
    ctes.append(
        r"""app0 AS (
      SELECT word, wcnt, trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS rep
      FROM wfull
    )"""
    )
    for k in range(1, _K + 1):
        ctes.append(
            f"""app{k} AS (
      SELECT a.word, a.wcnt,
             trim(replace(replace(' ' || a.rep || ' ',
                                  ' ' || b.pair || ' ',
                                  ' ' || replace(b.pair, ' ', '') || ' '),
                          ' ' || b.pair || ' ',
                          ' ' || replace(b.pair, ' ', '') || ' ')) AS rep
      FROM app{k - 1} a, best{k} b
    )"""
        )
    ctes.append(
        f"""tok AS (
      SELECT token, sum(wcnt) AS tok_count FROM (
        SELECT wcnt, unnest(string_split(rep, ' ')) AS token FROM app{_K}
      ) GROUP BY token
    )"""
    )
    return (
        "WITH " + ",\n    ".join(ctes)
        + """
    SELECT row_number() OVER (ORDER BY tok_count DESC, token) AS tok_rank,
           token, CAST(tok_count AS BIGINT) AS tok_count
    FROM tok ORDER BY tok_count DESC, token LIMIT 20"""
    )


def _merge_rep(rep, pair):
    """Apply one BPE merge to a space-separated representation: both
    occurrences-passes of the literal padded replace (see module
    docstring — one pass misses alternating chains, two catch all
    survivors because merged tokens separate them)."""
    pat = F.concat(F.lit(" "), pair, F.lit(" "))
    fused = F.concat(F.lit(" "), F.replace(pair, F.lit(" "), F.lit("")), F.lit(" "))
    padded = F.concat(F.lit(" "), rep, F.lit(" "))
    return F.trim(F.replace(F.replace(padded, pat, fused), pat, fused))


def _pair_counts(reps: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the representation table, weighted by
    word frequency.  Guarded sequence: sequence(1, 0) counts DOWN
    (CLAUDE.md), so single-token reps contribute an empty array."""
    toks = F.split(F.col("rep"), " ")
    pair_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        reps.select("wcnt", F.explode(pair_arr).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("wcnt").alias("wsum"))
    )


def _word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct length-bounded words with corpus frequencies — the one
    corpus-sized aggregation in this module."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word")
    )
    return (
        words.where(F.length("word").between(_WMIN, _WMAX))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )


def _char_rep(word_col) -> "F.Column":
    return F.trim(F.regexp_replace(word_col, "(.)", "$1 "))


def _learn_merges(spark: SparkSession, sf_dir: str, wc: DataFrame | None = None) -> list:
    """Run the K training rounds on the capped vocab table; returns the
    K winning 1-row frames (pair, wsum), each localCheckpointed.
    ``wc`` lets a caller that ALSO needs the word-count table (the
    only corpus-sized pass in this module) share one computation —
    ADVICE r7: q_bpe_apply used to run it twice."""
    vocab = (
        (_word_counts(spark, sf_dir) if wc is None else wc)
        .orderBy(F.desc("wcnt"), F.asc("word"))
        .limit(_V)
    )
    reps = vocab.select(
        "word", "wcnt", _char_rep("word").alias("rep")
    ).localCheckpoint(eager=True)

    bests = []
    for k in range(1, _K + 1):
        best = (
            _pair_counts(reps)
            .orderBy(F.desc("wsum"), F.asc("pair"))
            .limit(1)
            .localCheckpoint(eager=True)  # referenced by the output AND the merge
        )
        bests.append(best)
        if k == _K:
            break  # last round's reps are never read again
        reps = (
            reps.crossJoin(F.broadcast(best))
            .select(
                "word",
                "wcnt",
                _merge_rep(F.col("rep"), F.col("pair")).alias("rep"),
            )
            .localCheckpoint(eager=True)  # lineage would double per round
        )
    return bests


@register("q_bpe_train", sql=_bpe_oracle_sql())
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first {K} BPE merges from corpus word frequencies
    (see module docstring for the exactness + scale design).  Output:
    one row per merge round — the pair merged, the fused token, and
    the weighted occurrence count that won the round."""
    merge_rows = [
        best.select(
            F.lit(k).alias("step"),
            F.col("pair").alias("merge_pair"),
            F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
            F.col("wsum").cast("long").alias("weight"),
        )
        for k, best in enumerate(_learn_merges(spark, sf_dir), start=1)
    ]
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out.orderBy("step")


@register("q_bpe_apply", sql=_bpe_apply_oracle_sql())
def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the FULL word table with the learned merges and count
    the resulting subword units (top 20) — the fertility check a
    pipeline runs before committing to a vocabulary.  The application
    is K chained 1-row broadcast crossjoins over the distinct-word
    table (one linear plan, no iteration state: each learned merge is
    already checkpointed), then one hash agg; the ranking window runs
    over the subtoken vocabulary, whose size is bounded by the
    alphabet plus K merged units — not by the corpus."""
    from pyspark.sql import Window

    wc = scoped_persist(_word_counts(spark, sf_dir))
    reps = wc.select("word", "wcnt", _char_rep("word").alias("rep"))
    for best in _learn_merges(spark, sf_dir, wc=wc):
        reps = reps.crossJoin(F.broadcast(best.select("pair"))).select(
            "word", "wcnt", _merge_rep(F.col("rep"), F.col("pair")).alias("rep")
        )
    tok = (
        reps.select("wcnt", F.explode(F.split("rep", " ")).alias("token"))
        .groupBy("token")
        .agg(F.sum("wcnt").alias("tok_count"))
    )
    w = Window.orderBy(F.desc("tok_count"), F.asc("token"))
    return (
        tok.withColumn("tok_rank", F.row_number().over(w))
        .where(F.col("tok_rank") <= 20)
        .select("tok_rank", "token", F.col("tok_count").cast("long").alias("tok_count"))
        .orderBy("tok_rank")
    )


# ------------------------------------------------------------ persist/serve

BPE_INDEX_ROOT = "/tmp/processor_spark-bpe-index"
_BPE_FMT = 1


def _bpe_index_is_current(meta_path: str) -> bool:
    import json

    try:
        with open(meta_path) as fh:
            return json.load(fh).get("fmt") == _BPE_FMT
    except (OSError, ValueError):
        return False


def build_bpe_merges(
    spark: SparkSession, sf_dir: str, path: str | None = None, force: bool = False
) -> str:
    """Learn the merge table ONCE per fixture and persist it — the
    tokenizer-artifact half of the persist-and-serve pattern
    (CLAUDE.md): a trained vocabulary is built by one offline corpus
    job and then loaded by every downstream tokenization run, never
    re-learned per query.  Idempotent behind the atomic _INDEX_META
    marker (written LAST via tmp + os.replace — a crashed build is
    invisible)."""
    import json
    import os
    import shutil
    import uuid

    if path is None:
        tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(BPE_INDEX_ROOT, tag)
    meta = os.path.join(path, "_INDEX_META.json")
    if _bpe_index_is_current(meta) and not force:
        return path
    shutil.rmtree(path, ignore_errors=True)

    merges = q_bpe_train.__wrapped__(spark, sf_dir)
    merges.write.mode("overwrite").parquet(os.path.join(path, "merges.parquet"))

    tmp = meta + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump({"kind": "bpe", "fmt": _BPE_FMT, "k": _K, "v": _V}, fh)
    os.replace(tmp, meta)  # marker last: a crashed build is invisible
    return path


@register("q_bpe_serve", sql=_bpe_oracle_sql())
def q_bpe_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving twin of q_bpe_train: loads the persisted merge table
    instead of re-learning it.  SHARES the rebuild twin's oracle SQL,
    so the driver's hash check certifies the parquet round trip for
    free (the r6 serve-twin rule); the read is merges-table-sized —
    at 100 TB the corpus job is amortized across every consumer."""
    import os

    path = build_bpe_merges(spark, sf_dir)
    return (
        spark.read.parquet(os.path.join(path, "merges.parquet"))
        .select(
            "step",
            "merge_pair",
            "merged",
            F.col("weight").cast("long").alias("weight"),
        )
        .orderBy("step")
    )
