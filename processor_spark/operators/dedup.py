"""Deduplication operators for training-data pipelines (SURVEY.md §2.10).

Four strategies, cheapest-first — the standard LLM-corpus dedup ladder:
1. exact (content hash)            — q_dedup_exact (SQL oracle)
2. n-gram Jaccard near-dup         — q_dedup_ngram (SQL oracle)
3. MinHash + LSH banding           — q_dedup_minhash (xxhash64 hot path,
   rows-only) + q_dedup_minhash_md5 (portable md5 hash family, full
   SQL-oracle hash check of the identical banding algebra)
4. SimHash fingerprint Hamming     — q_simhash (xxhash64, rows-only) +
   q_simhash_md5 (portable 48-bit md5 variant, SQL oracle)

Scale notes: exact dedup is a single hash-agg keyed on the digest
(map-side combine collapses duplicates before the shuffle).  The
MinHash path never materializes the O(n²) pair space: docs are hashed
to (band, signature-slice) buckets and only bucket-mates are compared —
the shuffle key is the band hash, so candidate generation is a plain
equi-join.  All candidate verification joins carry only (doc_id,
token-set-hash) payloads, not full text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from processor_spark.caching import scoped_persist
from processor_spark.registry import register
from processor_spark.sources import load

# MinHash parameters: 16 permutations × 8 bands of 2 rows each.  The
# banding S-curve threshold is ~(1/b)^(1/r) = (1/8)^(1/2) ≈ 0.35 —
# matched to the declared JACCARD_THRESHOLD of 0.5 (the previous 4×4
# banding had threshold ≈ 0.71 and would start missing pairs near 0.5).
MINHASH_PERMS = 16
MINHASH_BANDS = 8
JACCARD_THRESHOLD = 0.5

# Stop-gram document-frequency cap for the exact n-gram inverted-index
# join: a gram appearing in more than this many docs (within a source)
# is dropped from BOTH the overlap numerator and the per-doc gram
# counts.  The gram self-join is quadratic in each gram's df, so one
# "the quick brown" posting list at corpus scale explodes the candidate
# pair count (AQE skew-split rebalances partitions but cannot shrink
# the pair set).  Ubiquitous grams carry no dedup signal — two docs
# sharing only stop-grams are not near-dups — while true near-dups
# (Jaccard >= 0.5) share mostly rare grams, so the cap preserves the
# answer.  Fixture max df is 6 at sf0.1, so at test scale the cap is
# provably inert; the oracle SQL applies the identical cap.
NGRAM_DF_CAP = 64

# Bucket-size cap for the LSH band equi-join — the same skew argument
# as NGRAM_DF_CAP, one level up: a (band_id, band_key) bucket shared by
# more than this many docs is a boilerplate cluster (identical
# signature slices across a template family), not a near-dup signal,
# and its posting list would emit O(df²) candidate pairs.  Dropping
# over-cap buckets bounds the worst-case pair emission per bucket at
# C(64,2) regardless of corpus size; true near-dup pairs (J >= 0.5)
# still meet in their OTHER, rarer bands w.h.p.  Fixture max bucket df
# is 13 at sf0.1, so at test scale the cap is provably inert; the md5
# oracles apply the identical cap (VERDICT r4 next-round #2).
BAND_DF_CAP = 64

# Array-native token-3-gram construction: slide over the token array
# with transform(sequence(...)) instead of posexplode + a lead() window
# — the window form shuffles and sorts the ENTIRE token stream by
# doc_id before the grams even exist (at 100 TB that is a corpus-sized
# exchange); this form is a per-row projection, zero shuffle, and
# yields the identical gram set.  Callers must filter size(toks) >= 3:
# sequence(0, -1) would COUNT DOWN, producing negative indices.
_GRAM3_EXPR = (
    "transform(sequence(0, size(toks) - 3),"
    " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
)


@register(
    "q_dedup_exact",
    sql="""
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keeper_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash; keeps min(doc_id) per group so the
    survivor choice is deterministic (dropDuplicates picks an arbitrary
    row — unusable under an oracle).  md5 used because both engines
    implement it identically; in production xxhash64 is cheaper.
    """
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def _tokens(col, mode: str = "ws"):
    """Token array; ``mode='unicode'`` enables the codepoint-class
    segmentation so the n-gram/minhash ladder keeps recall on CJK /
    mixed-script corpora (functions/tokenize.py; the ws default is the
    §2.10 oracle convention)."""
    from processor_spark.functions.tokenize import tokenize

    return tokenize(col, mode)


@register(
    "q_dedup_ngram",
    sql=f"""
    WITH grams_all AS (
      SELECT DISTINCT doc_id, source,
             tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS gram
      FROM (
        SELECT doc_id, source,
               unnest(string_split_regex(trim(text), '\\s+')) AS tok,
               generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos
        FROM documents
      )
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(tok, 2) OVER w IS NOT NULL
    ), grams AS (
      SELECT doc_id, source, gram FROM grams_all
      QUALIFY count(*) OVER (PARTITION BY source, gram) <= {NGRAM_DF_CAP}
    ), sized AS (
      SELECT doc_id, source, count(*) AS n_grams FROM grams GROUP BY 1, 2
    ), pair_overlap AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM grams a JOIN grams b
        ON a.gram = b.gram AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           round(p.n_common / (sa.n_grams + sb.n_grams - p.n_common), 6) AS jaccard
    FROM pair_overlap p
    JOIN sized sa ON sa.doc_id = p.doc_a
    JOIN sized sb ON sb.doc_id = p.doc_b
    WHERE p.n_common / (sa.n_grams + sb.n_grams - p.n_common) >= 0.5
    """,
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact token-3-gram Jaccard >= 0.5, blocked by source.

    Inverted-index join on the gram itself (within a blocking key)
    instead of all-pairs: the shuffle key is the gram, each gram's
    posting list meets only its own doc pairs.  Common-gram skew — the
    classic hazard at 100 TB, quadratic in each gram's posting-list
    length — is bounded by the NGRAM_DF_CAP stop-gram filter: a
    map-side-combinable df pre-agg followed by a left-semi join drops
    grams shared by > cap docs per source, so no posting list can emit
    more than cap*(cap-1)/2 pairs.  Jaccard is then computed over the
    same capped gram space on both numerator and denominator (and
    identically in the oracle SQL).
    """
    d = load(spark, sf_dir, "documents", spread=True)
    return _ngram_jaccard_pairs(d)


def _ngram_jaccard_pairs(d: DataFrame, mode: str = "ws") -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard over ``d`` (doc_id,
    source, text) — the q_dedup_ngram pipeline, tokenizer-mode
    parameterized so the unicode ladder (q_dedup_ngram_unicode) runs
    the identical scalable shape."""
    # distinct FIRST (partial hash-agg dedups map-side, so the shuffle
    # carries the distinct stream, not the raw one — on a near-dup
    # corpus raw >> distinct); then the df cap is ONE window count over
    # (source, gram), riding one more exchange of the distinct stream.
    # (A lag()-based fused dedup+cap saves that exchange but sorts the
    # RAW stream — measured slower at scale-relevant dup ratios.)
    rows = (
        d.select("doc_id", "source", _tokens(F.col("text"), mode).alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", "source", F.explode(F.expr(_GRAM3_EXPR)).alias("gram"))
        .distinct()
    )
    wf = Window.partitionBy("source", "gram")
    grams = (
        rows.withColumn("df", F.count(F.lit(1)).over(wf))
        .where(F.col("df") <= NGRAM_DF_CAP)
        .select("doc_id", "source", "gram")
        # NOT persisted (r6): grams is referenced twice (size agg +
        # posting agg) but both consumers are cheap aggregations — the
        # r4 persist win predates the local-pair rewrite, when a
        # gram×gram SELF-JOIN re-read this stream at pair scale.
        # Measured now: no-persist is equal at sf0.1 (1.65 vs 1.8 s)
        # and ~35% faster at 64× docs (14 vs 19 s) — materializing a
        # corpus-sized cache costs more than recomputing two cheap
        # aggs, and at 100 TB the gram stream could never be cached
        # anyway.
    )
    sized = grams.groupBy("doc_id", "source").agg(F.count(F.lit(1)).alias("n_grams"))
    # pairs are generated LOCALLY from each gram's posting list (arrays
    # bounded by the df cap, so collect_list is ≤ cap elements — no
    # skew hazard and no gram×gram self-join shuffle; posting agg rides
    # the window's (source, gram) partitioning with no new exchange)
    posting = grams.groupBy("source", "gram").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    pairs = posting.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) ->"
                " transform(slice(ds, i + 2, size(ds)),"
                " y -> struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    overlap = pairs.groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("n_common"))
    sa = sized.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("grams_a"))
    sb = sized.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("grams_b"))
    jac = F.col("n_common") / (F.col("grams_a") + F.col("grams_b") - F.col("n_common"))
    return (
        overlap.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@register("q_dedup_minhash", sql=None)  # seeded-hash specific → rows-only
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH-banding near-dup candidates (the 100 TB dedup path).

    Signature: per doc, MINHASH_PERMS min-hashes of its distinct token
    3-grams, each permutation simulated by xxhash64(seed_i, gram) —
    built-in, JVM-side, no UDF.  Banding: the signature is split into
    MINHASH_BANDS bands; docs agreeing on any full band become
    candidate pairs (equi-join on the band hash).  Estimated Jaccard =
    fraction of agreeing minhashes; pairs >= threshold are emitted.
    Never materializes all pairs; candidate volume is controlled by the
    band/row trade-off (8 bands × 2 rows → catches J >= ~0.5 w.h.p.).
    """
    d = load(spark, sf_dir, "documents", spread=True)
    grams = (
        d.select("doc_id", _tokens(F.col("text")).alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", F.explode(F.expr(_GRAM3_EXPR)).alias("gram"))
        .distinct()
    )
    # one min-hash per permutation, all in a single hash-agg pass
    sig = grams.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("gram"))).alias(f"mh{i}")
            for i in range(MINHASH_PERMS)
        ]
    )
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    # explode into (band_id, band_hash) — band hash combines its rows
    bands = sig.select(
        "doc_id",
        *[F.col(f"mh{i}") for i in range(MINHASH_PERMS)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                        ).alias("band_hash"),
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash", *[f"mh{i}" for i in range(MINHASH_PERMS)])
    # BAND_DF_CAP skew guard + LOCAL pair generation from cap-bounded
    # posting arrays (same shape as the md5 twin / q_dedup_ngram): the
    # window's cap filter runs BEFORE collect_list, the bucket agg
    # rides the window's exchange, and no self-join or persist exists
    mh_cols = [f"mh{i}" for i in range(MINHASH_PERMS)]
    wb = Window.partitionBy("band_id", "band_hash")
    buckets = (
        bands.withColumn("bdf", F.count(F.lit(1)).over(wb))
        .where(F.col("bdf") <= BAND_DF_CAP)
        .groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", *mh_cols))).alias("ds"))
        .where(F.size("ds") >= 2)
    )
    agree = "(" + " + ".join(
        f"(CASE WHEN x.mh{i} = y.mh{i} THEN 1 ELSE 0 END)"
        for i in range(MINHASH_PERMS)
    ) + ")"
    pair_expr = (
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds)), "
        f"y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b, {agree} AS agree))))"
    )
    cands = (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(
            "p.doc_a",
            "p.doc_b",
            (F.col("p.agree") / F.lit(float(MINHASH_PERMS))).alias("est_jaccard"),
        )
        .distinct()
    )
    return cands.where(F.col("est_jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round("est_jaccard", 4).alias("est_jaccard")
    )


# md5-derived minhash values (md5 is the one digest both engines
# compute identically).  r6: each digest yields FOUR independent 32-bit
# permutation hashes (hex chars 1-8, 9-16, 17-24, 25-32 — avalanche
# makes the chunks independent), so the 8-permutation family costs TWO
# md5 calls per gram instead of eight — the md5 stage was the measured
# CPU bottleneck of the whole dedup bench tier.  32-bit minhash is the
# standard production width; within-doc min collisions need ~2^16
# distinct grams per doc (fixture max is ~hundreds).
_MD5_PERMS = 8
_MD5_SEEDS = 2  # digests per gram; 4 chunks each
_MD5_BANDS = 4  # 4 bands × 2 rows → S-curve threshold (1/4)^(1/2) = 0.5


def _md5_sig_ctes() -> str:
    """Oracle twin of :func:`_md5_sig` (follows a ``grams`` CTE):
    seeded digests, then per-doc mins of each exact 32-bit chunk —
    ``CAST('0x'||hex8 AS BIGINT)`` parses losslessly on DuckDB just as
    ``conv(hex8,16,10)`` does on Spark."""
    chunk_cols = ",\n             ".join(
        f"min(CAST(('0x' || substr(d{s}, {1 + 8 * j}, 8)) AS BIGINT)) AS mh{4 * s + j}"
        for s in range(_MD5_SEEDS)
        for j in range(4)
    )
    digest_cols = ", ".join(
        f"md5('{s}:' || gram) AS d{s}" for s in range(_MD5_SEEDS)
    )
    return (
        f"digests AS (\n"
        f"      SELECT doc_id, {digest_cols}\n"
        f"      FROM grams\n"
        f"    ), sig AS (\n"
        f"      SELECT doc_id,\n             {chunk_cols}\n"
        f"      FROM digests GROUP BY doc_id\n"
        f"    )"
    )


def _band_cte_sql() -> str:
    """The oracle twin of _md5_bands: explode sig into band rows
    (UNION ALL per band, band_key spelled exactly like Spark's
    concat_ws) and drop over-cap buckets with the identical
    BAND_DF_CAP window count."""
    mh = ", ".join(f"mh{i}" for i in range(_MD5_PERMS))
    rows = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, "
        f"CAST(mh{2 * b} AS VARCHAR) || '_' || CAST(mh{2 * b + 1} AS VARCHAR) AS band_key, "
        f"{mh} FROM sig"
        for b in range(_MD5_BANDS)
    )
    return (
        f"band_rows AS (\n      {rows}\n    ), bands AS (\n"
        f"      SELECT * FROM band_rows\n"
        f"      QUALIFY count(*) OVER (PARTITION BY band_id, band_key) <= {BAND_DF_CAP}\n"
        f"    )"
    )


def _md5_sig(d: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh7) portable md5-chunk minhash signatures:
    _MD5_SEEDS digests per gram, four exact 32-bit chunks per digest
    (see the family note above — 4× less md5 than digest-per-perm)."""
    grams = (
        d.select("doc_id", _tokens(F.col("text")).alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", F.explode(F.expr(_GRAM3_EXPR)).alias("gram"))
        .distinct()
    )
    digs = grams.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{s}:"), F.col("gram")).cast("binary")).alias(f"d{s}")
            for s in range(_MD5_SEEDS)
        ],
    )

    def mh(s: int, j: int):
        return F.min(
            F.conv(F.substring(F.col(f"d{s}"), 1 + 8 * j, 8), 16, 10).cast("long")
        ).alias(f"mh{4 * s + j}")

    return digs.groupBy("doc_id").agg(
        *[mh(s, j) for s in range(_MD5_SEEDS) for j in range(4)]
    )


def _md5_bands(sig: DataFrame) -> DataFrame:
    """Explode a signature into (doc_id, band_id, band_key, mh*) — the
    LSH bucket index rows — then drop buckets with more than
    BAND_DF_CAP docs: one window count over the band stream.  The
    window's (band_id, band_key) exchange is the SAME distribution the
    downstream per-bucket collect_list needs, so the cap + bucket agg
    ride a single shuffle, and the cap filter runs BEFORE collect_list
    so no executor ever materializes an unbounded posting array (the
    q_dedup_ngram r4 pattern, one level up)."""
    mh_cols = [f"mh{i}" for i in range(_MD5_PERMS)]
    bands = sig.select(
        "doc_id",
        *mh_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "_",
                            F.col(f"mh{2 * b}").cast("string"),
                            F.col(f"mh{2 * b + 1}").cast("string"),
                        ).alias("band_key"),
                    )
                    for b in range(_MD5_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key", *mh_cols)
    wb = Window.partitionBy("band_id", "band_key")
    return (
        bands.withColumn("bdf", F.count(F.lit(1)).over(wb))
        .where(F.col("bdf") <= BAND_DF_CAP)
        .drop("bdf")
    )


# Per-pair signature agreement, evaluated LOCALLY between two posting
# array structs (x, y) — no self-join ever touches the band stream.
_MD5_AGREE = "(" + " + ".join(
    f"(CASE WHEN x.mh{i} = y.mh{i} THEN 1 ELSE 0 END)" for i in range(_MD5_PERMS)
) + ")"


def _md5_buckets(sig: DataFrame) -> DataFrame:
    """(band_id, band_key, ds) with ds a doc_id-sorted posting array of
    (doc_id, mh*) structs, bounded by BAND_DF_CAP — the local-pair
    generation base shared by the md5 dedup keys."""
    mh_cols = [f"mh{i}" for i in range(_MD5_PERMS)]
    return (
        _md5_bands(sig)
        .groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", *mh_cols))).alias("ds"))
        .where(F.size("ds") >= 2)
    )


# Named so q_curation_verdicts can compose the fuzzy tier's full
# oracle as a CTE (the registered-oracles-compose pattern).
_MINHASH_MD5_SQL = f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS tok,
             generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id,
             tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS gram
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(tok, 2) OVER w IS NOT NULL
    ), {_md5_sig_ctes()}, {_band_cte_sql()}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(({" + ".join(f"CAST(a.mh{i} = b.mh{i} AS INTEGER)" for i in range(_MD5_PERMS))}) / {_MD5_PERMS}.0, 4) AS est_jaccard
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """


@register("q_dedup_minhash_md5", sql=_MINHASH_MD5_SQL)
def q_dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with an engine-portable (md5-derived) hash family —
    the SQL-verifiable twin of q_dedup_minhash.

    Same banding algebra as the xxhash64 path (which stays the
    production hot path — xxhash64 is JVM-native and cheaper still)
    but every permutation hash is an exact 32-bit chunk of
    md5("<seed>:<gram>") — four chunks per digest, two digests per
    gram (see the family note above) — which DuckDB reproduces
    bit-for-bit, so the full candidate-pair set and estimated Jaccards
    hash-match under the driver's oracle.  8 permutations in 4 bands
    of 2 rows → candidate threshold (1/4)^(1/2) = 0.5.  The Spark plan is the scalable shape
    (band-bucket equi-join); the oracle's OR-of-bands nested-loop join
    is fine at oracle scale only.
    """
    d = load(spark, sf_dir, "documents", spread=True)
    # pairs are generated LOCALLY from each bucket's cap-bounded
    # posting array (the q_dedup_ngram r4 pattern): no band self-join,
    # no shared-subplan persist — the signature pipeline is computed
    # exactly once on a single linear plan
    pair_expr = (
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds)), "
        f"y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b, {_MD5_AGREE} AS agree))))"
    )
    return (
        _md5_buckets(_md5_sig(d))
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(
            "p.doc_a",
            "p.doc_b",
            F.round(
                F.col("p.agree").cast("double") / F.lit(float(_MD5_PERMS)), 4
            ).alias("est_jaccard"),
        )
        .distinct()
    )


@register(
    "q_dedup_incremental",
    sql=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS tok,
             generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id,
             tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS gram
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(tok, 2) OVER w IS NOT NULL
    ), {_md5_sig_ctes()}, {_band_cte_sql()}
    SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS match_doc,
           round(({" + ".join(f"CAST(a.mh{i} = b.mh{i} AS INTEGER)" for i in range(_MD5_PERMS))}) / {_MD5_PERMS}.0, 4) AS est_jaccard,
           (({" + ".join(f"CAST(a.mh{i} = b.mh{i} AS INTEGER)" for i in range(_MD5_PERMS))}) / {_MD5_PERMS}.0) >= 0.5 AS is_dup
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the production daily-ingest shape: a NEW
    batch of documents (here: doc_id % 10 == 0) is checked against the
    EXISTING corpus without ever re-comparing corpus×corpus.

    The corpus's band rows are exactly the LSH index a 100 TB pipeline
    materializes once (pay the signature pass when a doc lands, store
    (band_id, band_key, doc_id, sig)); each ingest then joins only
    new-side bands against that index — cost O(|new| × bands), not
    O(|corpus|²).  Both sides here derive from one signature pass over
    documents (the fixture stands in for index + batch); the equi-join
    on (band_id, band_key) is the identical scalable shape.  Emits every
    candidate with its estimated Jaccard and an is_dup verdict at the
    0.5 S-curve threshold; the full md5-chunk SQL oracle replays
    pairs, estimates, and verdicts bit-for-bit.
    """
    d = load(spark, sf_dir, "documents", spread=True)
    # new×corpus pairs generated LOCALLY inside each cap-bounded bucket
    # (filter splits the posting array by batch membership) — the same
    # single-linear-plan shape as q_dedup_minhash_md5, so no persist
    pair_expr = (
        "flatten(transform(filter(ds, x -> x.doc_id % 10 = 0), x -> "
        "transform(filter(ds, y -> y.doc_id % 10 <> 0), "
        f"y -> struct(x.doc_id AS new_doc, y.doc_id AS match_doc, {_MD5_AGREE} AS agree))))"
    )
    est = F.col("p.agree").cast("double") / F.lit(float(_MD5_PERMS))
    return (
        _md5_buckets(_md5_sig(d))
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(
            "p.new_doc",
            "p.match_doc",
            F.round(est, 4).alias("est_jaccard"),
            (est >= F.lit(0.5)).alias("is_dup"),
        )
        .distinct()
    )


@register("q_simhash", sql=None)  # bit-vote fingerprint, engine-specific hash → rows-only
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprint per document via per-bit token voting.

    tokens × 64 bit positions are exploded (pure built-ins: sequence +
    explode + shiftright), each bit votes ±1, and the sign of the vote
    sum sets the fingerprint bit.  The 64× row blowup is embarrassingly
    parallel and map-side aggregated — at 100 TB this is one wide agg,
    no joins.  Near-dup = small Hamming distance between fingerprints
    (checked in tests; pairing strategy would be banding on bit slices,
    same shape as MinHash LSH).
    """
    d = load(spark, sf_dir, "documents", spread=True)
    toks = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok")).withColumn(
        "h", F.xxhash64("tok")
    )
    bits = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
        F.col("h"),
    ).select(
        "doc_id",
        "bit",
        (F.expr("shiftright(h, bit)").bitwiseAND(F.lit(1)) * 2 - 1).alias("vote"),
    )
    votes = bits.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    # bit_or (not arithmetic sum) assembles the fingerprint: no int64
    # overflow at bit 63 under ANSI mode
    return (
        votes.withColumn(
            "bitval",
            F.when(F.col("v") > 0, F.expr("shiftleft(1L, bit)")).otherwise(
                F.lit(0).cast("bigint")
            ),
        )
        .groupBy("doc_id")
        .agg(F.bit_or("bitval").alias("simhash"))
    )


@register("q_dedup_near", sql=None)  # SURVEY §2.10 contract name for the MinHash path
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection (SURVEY.md §2.10 'q_dedup_near'): the MinHash+LSH
    candidate pipeline; q_dedup_ngram is the exact-Jaccard SQL-oracled twin."""
    return q_dedup_minhash(spark, sf_dir)


# The clusters oracle shares the capped-gram CTEs with q_dedup_ngram's
# oracle (same NGRAM_DF_CAP stop-gram filter), then closes the pair set
# transitively with a recursive CTE.
@register(
    "q_dedup_clusters",
    sql=f"""
    WITH RECURSIVE grams_all AS (
      SELECT DISTINCT doc_id, source,
             tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS gram
      FROM (
        SELECT doc_id, source,
               unnest(string_split_regex(trim(text), '\\s+')) AS tok,
               generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos
        FROM documents
      )
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(tok, 2) OVER w IS NOT NULL
    ), grams AS (
      SELECT doc_id, source, gram FROM grams_all
      QUALIFY count(*) OVER (PARTITION BY source, gram) <= {NGRAM_DF_CAP}
    ), sized AS (
      SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY 1
    ), pair_overlap AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM grams a JOIN grams b
        ON a.gram = b.gram AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT p.doc_a, p.doc_b
      FROM pair_overlap p
      JOIN sized sa ON sa.doc_id = p.doc_a
      JOIN sized sb ON sb.doc_id = p.doc_b
      WHERE p.n_common / (sa.n_grams + sb.n_grams - p.n_common) >= 0.5
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ), reach(src, dst) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )
    SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS via connected components over near-dup pairs —
    the iterative step real dedup pipelines need (pairs alone
    over-remove: A~B, B~C must keep exactly one of {A,B,C}).

    Spark side: large-star/small-star alternation
    (graph.connected_components) — O(log n) rounds where the r1/r2
    min-label propagation needed O(diameter) (a 100 TB dup CHAIN can
    be thousands of hops; at 100× data that is the difference between
    ~5 shuffles and ~20+).  The oracle replays the same reachability
    closure as a recursive CTE, so even the engine's one iterative
    operator is hash-checked.
    """
    from processor_spark.operators.graph import connected_components

    # materialize the (expensive) candidate-pair pipeline ONCE before
    # the iterative loop re-reads it every round
    pairs = (
        q_dedup_ngram(spark, sf_dir)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    return connected_components(pairs)


@register(
    "q_dedup_canonical",
    sql="""
    WITH canon AS (
      SELECT source,
             md5(text) AS exact_h,
             md5(array_to_string(list_sort(string_split_regex(trim(lower(text)), '\\s+')), ' '))
               AS canon_h
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT exact_h) AS n_exact_distinct,
           count(DISTINCT canon_h) AS n_canonical_distinct
    FROM canon
    GROUP BY source
    """,
)
def q_dedup_canonical(spark: SparkSession, sf_dir: str, mode: str = "ws") -> DataFrame:
    """Canonicalized (token-set) dedup: documents are normalized —
    lowercase, trimmed, tokens SORTED — before hashing, so permuted /
    re-ordered copies collapse to one canonical id that byte-exact
    hashing misses.  Per source: raw docs vs exact-distinct vs
    canonical-distinct.  The canonical key is built entirely from
    array built-ins (split -> sort -> rejoin -> md5) inside codegen,
    then it's an ordinary two-level distinct agg — the cheapest
    near-dup tier, run before MinHash (q_dedup_minhash) in the
    pipeline."""
    d = load(spark, sf_dir, "documents")
    canon = d.select(
        "source",
        F.md5("text").alias("exact_h"),
        F.md5(
            F.array_join(F.array_sort(_tokens(F.lower(F.col("text")), mode)), " ")
        ).alias("canon_h"),
    )
    return canon.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("exact_h").alias("n_exact_distinct"),
        F.countDistinct("canon_h").alias("n_canonical_distinct"),
    )


@register(
    "q_simhash_md5",
    sql="""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
      )
    ), hashed AS (
      SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) AS h
      FROM toks
    ), votes AS (
      SELECT doc_id, b.bit,
             sum(CASE WHEN ((h >> b.bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
      FROM hashed CROSS JOIN (SELECT unnest(range(48)) AS bit) b
      GROUP BY doc_id, b.bit
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT)
             AS fingerprint
    FROM votes GROUP BY doc_id
    """,
)
def q_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint with an engine-portable (md5-derived) hash —
    the SQL-verifiable twin of q_simhash, same pattern as
    q_dedup_minhash_md5.

    48-bit fingerprints (12 md5 hex chars) instead of 64 so every
    DuckDB-side intermediate stays exact; the bit-vote algebra is
    identical: distinct tokens hash once, each of the 48 positions
    votes ±1 per token, vote sign sets the bit.  Ties (vote sum 0)
    resolve to 0 on both engines.  One explode + two hash-aggs — no
    joins, map-side combinable, embarrassingly parallel at 100 TB.
    """
    d = load(spark, sf_dir, "documents", spread=True)
    toks = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok")).distinct()
    h = F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 12), 16, 10).cast("long")
    hashed = toks.select("doc_id", h.alias("h"))
    bits = hashed.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(47))).alias("bit"),
        "h",
    ).select(
        "doc_id",
        "bit",
        (F.expr("shiftright(h, bit)").bitwiseAND(F.lit(1)) * 2 - 1).alias("vote"),
    )
    votes = bits.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(1L, bit)")).otherwise(F.lit(0).cast("long"))
        )
        .cast("bigint")
        .alias("fingerprint")
    )


@register(
    "q_dedup_substring",
    sql="""
    WITH base AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ), pos AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(array_to_string(toks[u.pos : u.pos + 9], ' ')), 1, 12))
                  AS BIGINT) AS sh_h
      FROM base, unnest(range(1, len(toks) - 8)) AS u(pos)
      WHERE len(toks) >= 10
    ), sh AS (
      SELECT sh_h, count(DISTINCT doc_id) AS ndocs
      FROM pos GROUP BY sh_h
    )
    SELECT p.doc_id,
           count(*) AS n_windows,
           CAST(sum(CASE WHEN s.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST((1000 * sum(CASE WHEN s.ndocs >= 2 THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
             AS dup_permille
    FROM pos p JOIN sh s ON p.sh_h = s.sh_h
    GROUP BY p.doc_id
    """,
)
def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate coverage — the tier of the dedup
    ladder BELOW document granularity: for each document, the fraction
    of its sliding 10-token windows that occur verbatim in at least
    one OTHER document (the repeated-substring measure behind
    span-level training-data dedup; doc-level MinHash misses a unique
    page that embeds a duplicated paragraph).

    Shape: one explode to (doc, shingle-fingerprint), one agg for
    cross-doc shingle df, one equi-join back on the fingerprint, one
    per-doc agg — all hash-partitioned on the fingerprint/doc key, no
    pair space at all (coverage needs no doc×doc join, which is what
    keeps this tier cheap at 100 TB; flagged docs then feed the
    pairwise verifiers).  Shingles travel as 48-bit md5 fingerprints,
    not 60-80-byte strings — an ~8× smaller shuffle/join payload, and
    because the ORACLE applies the identical md5-48 mapping, any
    fingerprint collision (P ≈ n²/2⁴⁹) affects both engines
    identically, so parity is exact by construction.  The permille
    ratio uses integer division, so the oracle replays every value
    exactly.
    """
    d = load(spark, sf_dir, "documents", spread=True)
    base = d.select("doc_id", _tokens(F.col("text")).alias("toks")).withColumn(
        "n", F.size("toks")
    ).where(F.col("n") >= 10)
    pos = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("n") - 9)).alias("pos"),
        "toks",
    ).select(
        "doc_id",
        F.conv(
            F.substring(
                F.md5(
                    F.array_join(F.slice("toks", F.col("pos"), F.lit(10)), " ").cast(
                        "binary"
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("sh_h"),
    )
    # "shingle occurs in >= 2 docs" ⟺ min(doc_id) != max(doc_id) within
    # the shingle's partition — a single window over ONE shuffle by
    # sh_h, instead of countDistinct-agg + join-back (3 shuffles + a
    # persisted double scan of the shingle stream)
    from pyspark.sql import Window

    w = Window.partitionBy("sh_h")
    flagged = pos.select(
        "doc_id",
        (F.min("doc_id").over(w) != F.max("doc_id").over(w))
        .cast("int")
        .alias("is_dup"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("is_dup").cast("long").alias("n_dup"),
        F.expr("CAST((1000 * sum(is_dup)) div count(*) AS BIGINT)").alias(
            "dup_permille"
        ),
    )


@register(
    "q_source_jaccard",
    sql=r"""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(string_split_regex(trim(text), '\s+')) AS tok,
             generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
      FROM documents
    ), grams_raw AS (
      SELECT DISTINCT source,
             tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS gram
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(tok, 2) OVER w IS NOT NULL
    ), g AS (
      SELECT DISTINCT source,
             CAST(('0x' || substr(md5(gram), 1, 12)) AS BIGINT) AS gh
      FROM grams_raw
    ), sizes AS (
      SELECT source, count(*) AS n FROM g GROUP BY source
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
      FROM g a JOIN g b ON a.gh = b.gh AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           (CAST(i.n_common AS BIGINT) * 1000) // (sa.n + sb.n - i.n_common)
             AS jaccard_permille
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    """,
)
def q_source_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-level 3-gram Jaccard between source pairs — the overlap
    audit run before mixing corpora (is 'web' a superset of 'wiki'?
    did two crawls ingest the same site?), one granularity above the
    per-document dedup ladder.  Gram sets travel as portable 48-bit
    md5 ints (never strings); the pairwise intersection is an
    equi-join on the gram hash where the fan-out per gram is bounded
    by the SOURCE count (≤ C(|sources|,2) pairs per gram — |sources|
    is a dim cardinality, so unlike the document-level join no df cap
    is needed); set sizes are dim-sized and broadcast back.  Exact
    integer permille, inclusion-exclusion union.

    Plan: distinct (source, gh) → one hash-agg; self-join co-
    partitioned on gh (the distinct already shuffled on it); final
    joins are 5-row broadcasts."""
    # spread: the gram+md5 stage is compute-dense and runs BEFORE the
    # first exchange — a single-file scan would pin it to one core
    d = load(spark, sf_dir, "documents", spread=True)
    toks = d.select("source", _tokens(F.col("text")).alias("toks")).where(
        F.size("toks") >= 3
    )
    gh = F.conv(F.substring(F.md5(F.col("gram").cast("binary")), 1, 12), 16, 10).cast(
        "long"
    )
    # ONE wide shuffle total: the raw gram stream reduces straight to
    # gh → sorted source-set (collect_set dedups map-side), and both
    # set sizes and pairwise intersections derive LOCALLY from that
    # persisted per-gram array (≤ |sources| elements) — no distinct
    # pre-pass, no gram×gram self-join re-shuffle (the posting-array
    # trick from q_dedup_ngram; measured 2.5 s → ~1 s at sf0.1)
    bysrc = (
        toks.select("source", F.explode(F.expr(_GRAM3_EXPR)).alias("gram"))
        .select("source", gh.alias("gh"))
        .groupBy("gh")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .transform(scoped_persist)
    )
    sizes = (
        bysrc.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    inter = (
        bysrc.where(F.size("srcs") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(srcs, (s, i) ->"
                    " transform(slice(srcs, i + 2, size(srcs)),"
                    " t -> struct(s AS source_a, t AS source_b))))"
                )
            ).alias("pr")
        )
        .groupBy("pr.source_a", "pr.source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            F.expr("(n_common * 1000) div (n_a + n_b - n_common)").alias(
                "jaccard_permille"
            ),
        )
    )


# Planted multilingual near-dup rows for q_dedup_ngram_unicode (the
# fixture corpus is ASCII; negative ids can't collide).  Two planted
# near-dup pairs: a pure-CJK pair and a mixed-script pair whose
# Latin→Han boundaries exercise the r6 tokenizer fix.
_UNI_DEDUP_PLANTS = [
    (-1, "planted", "深度学习模型需要大规模高质量的训练数据来提升泛化能力"),
    (-2, "planted", "深度学习模型需要大规模高质量的训练数据来改进泛化效果"),
    (-3, "planted", "今日の天気は晴れです散歩に行きましょう"),
    (-4, "planted", "用Python写代码来清洗大规模训练数据的标准流程"),
    (-5, "planted", "用Python写代码来清洗大规模训练数据的通用方法"),
    (-6, "planted", "completely unrelated english filler text document"),
]

_UNI_PLANT_VALUES = ", ".join(
    f"({i}, '{s}', '{t}')" for i, s, t in _UNI_DEDUP_PLANTS
)


def _uni_ngram_sql() -> str:
    from processor_spark.functions.tokenize import UNICODE_TOKEN_PATTERN_RE2

    return f"""
    WITH docs AS (
      SELECT doc_id, source, text FROM documents WHERE doc_id % 20 = 0
      UNION ALL
      SELECT * FROM (VALUES {_UNI_PLANT_VALUES}) AS v(doc_id, source, text)
    ), toked AS (
      SELECT doc_id, source,
             regexp_extract_all(text, '{UNICODE_TOKEN_PATTERN_RE2}') AS toks
      FROM docs
    ), grams_all AS (
      SELECT DISTINCT doc_id, source,
             tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS gram
      FROM (
        SELECT doc_id, source, unnest(toks) AS tok,
               generate_subscripts(toks, 1) AS pos
        FROM toked
      )
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(tok, 2) OVER w IS NOT NULL
    ), grams AS (
      SELECT doc_id, source, gram FROM grams_all
      QUALIFY count(*) OVER (PARTITION BY source, gram) <= {NGRAM_DF_CAP}
    ), sized AS (
      SELECT doc_id, source, count(*) AS n_grams FROM grams GROUP BY 1, 2
    ), pair_overlap AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM grams a JOIN grams b
        ON a.gram = b.gram AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           round(p.n_common / (sa.n_grams + sb.n_grams - p.n_common), 6) AS jaccard
    FROM pair_overlap p
    JOIN sized sa ON sa.doc_id = p.doc_a
    JOIN sized sb ON sb.doc_id = p.doc_b
    WHERE p.n_common / (sa.n_grams + sb.n_grams - p.n_common) >= {JACCARD_THRESHOLD}
    """


@register("q_dedup_ngram_unicode", sql=_uni_ngram_sql())
def q_dedup_ngram_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The n-gram near-dup ladder under UNICODE tokenization, driven
    end-to-end through the hash gate: a fixture slice UNIONed with
    planted CJK / mixed-script near-dup pairs runs the IDENTICAL
    pipeline as q_dedup_ngram (_ngram_jaccard_pairs, mode='unicode')
    and must emit the planted pairs — pairs whitespace tokenization
    cannot see at all (a CJK doc is ONE ws token → zero 3-grams).
    The oracle replays tokenization (RE2 twin of the Java pattern,
    functions/tokenize.py), gram construction, df cap, and jaccard
    bit-for-bit, so the cross-engine contract covers the whole CJK
    dedup path, not just the token stream (q_token_unicode).

    Scale shape: identical to q_dedup_ngram — the mode flag changes
    one regexp in the scan projection and nothing downstream."""
    d = (
        load(spark, sf_dir, "documents", spread=True)
        .where(F.col("doc_id") % 20 == 0)
        .select("doc_id", "source", "text")
    )
    planted = spark.createDataFrame(
        _UNI_DEDUP_PLANTS, "doc_id long, source string, text string"
    )
    return _ngram_jaccard_pairs(d.unionByName(planted), mode="unicode")


# ------------------------------------------------- content-defined chunks

_CDC_W = 4  # rolling window (tokens)
_CDC_B = 33  # polynomial base
_CDC_MASK = 32  # boundary when H % 32 == 0 -> ~32-token avg chunks

# token hash: first 8 md5 hex chars as int, reduced to 20 bits so the
# 4-term polynomial (max ~1e6 * 33^3) stays far from int64 under ANSI
_CDC_HS_SPARK = (
    "transform(toks, t -> CAST(conv(substr(md5(CAST(t AS BINARY)), 1, 8), 16, 10)"
    " AS BIGINT) % 1048576)"
)
_CDC_HS_DUCK = (
    "list_transform(toks, t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)"
    " % 1048576)"
)


@register(
    "q_cdc_chunks",
    sql=f"""
    WITH base AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ), hashed AS (
      SELECT doc_id, source, toks, {_CDC_HS_DUCK} AS hs FROM base
    ), cut AS (
      SELECT doc_id, source, toks,
             list_sort(list_distinct(list_concat(
               list_filter(range({_CDC_W}, len(toks) + 1),
                 i -> (hs[i-3] * {_CDC_B ** 3} + hs[i-2] * {_CDC_B ** 2}
                       + hs[i-1] * {_CDC_B} + hs[i]) % {_CDC_MASK} = 0),
               [len(toks)]))) AS bounds
      FROM hashed
    ), chunks AS (
      SELECT source,
             unnest(list_transform(range(1, len(bounds) + 1),
               j -> struct_pack(
                 fp := md5(array_to_string(
                   toks[(CASE WHEN j = 1 THEN 0 ELSE bounds[j-1] END) + 1 : bounds[j]],
                   ' ')),
                 tn := bounds[j]
                       - (CASE WHEN j = 1 THEN 0 ELSE bounds[j-1] END)))) AS c
      FROM cut
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT c.fp) AS BIGINT) AS n_distinct,
           CAST(sum(c.tn) AS BIGINT) AS sum_toks,
           CAST(max(c.tn) AS BIGINT) AS max_toks
    FROM chunks
    GROUP BY source
    ORDER BY source
    """,
)
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (Rabin/gear style) + chunk-level dedup
    stats per source — the storage-dedup primitive: chunk boundaries
    follow CONTENT (a windowed rolling hash hitting 0 mod 32), so an
    insertion early in a document shifts only the chunk it lands in,
    and identical passages shared across documents produce identical
    chunk fingerprints wherever they sit.

    All array-native per document (transform/filter over the token
    array — no explode of the token stream, no window): the 4-token
    polynomial hash uses 20-bit md5-derived token hashes so every
    term is exact int64 on both engines; chunk fingerprints are md5
    of the joined chunk text.  n_distinct < n_chunks measures the
    cross-document duplicated-passage mass.

    Scale shape: one narrow md5-dense map per document (spread
    across cores by the loader) then a single map-side-combinable
    agg on source; distinct-chunk counting at 100 TB swaps to an HLL
    merge (q_hll_sketch) with the same contract."""
    d = load(spark, sf_dir, "documents", spread=True)
    base = d.select(
        "doc_id", "source", _tokens(F.col("text")).alias("toks")
    )
    hashed = base.select("doc_id", "source", "toks", F.expr(_CDC_HS_SPARK).alias("hs"))
    poly = (
        f"element_at(hs, i - 3) * {_CDC_B ** 3} + element_at(hs, i - 2) * {_CDC_B ** 2}"
        f" + element_at(hs, i - 1) * {_CDC_B} + element_at(hs, i)"
    )
    cut = hashed.select(
        "doc_id",
        "source",
        "toks",
        F.expr(
            f"array_sort(array_distinct(concat("
            f"  CASE WHEN size(toks) >= {_CDC_W} THEN"
            f"    filter(sequence({_CDC_W}, size(toks)), i -> ({poly}) % {_CDC_MASK} = 0)"
            f"  ELSE array() END,"
            f"  array(size(toks)))))"
        ).alias("bounds"),
    )
    prev = "(CASE WHEN j = 1 THEN 0 ELSE element_at(bounds, j - 1) END)"
    chunks = cut.select(
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(bounds)), j -> struct("
                f"  md5(CAST(array_join(slice(toks, {prev} + 1,"
                f"        element_at(bounds, j) - {prev}), ' ') AS BINARY)) AS fp,"
                f"  element_at(bounds, j) - {prev} AS tn))"
            )
        ).alias("c"),
    )
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.countDistinct("c.fp").cast("long").alias("n_distinct"),
            F.sum("c.tn").cast("long").alias("sum_toks"),
            F.max("c.tn").cast("long").alias("max_toks"),
        )
        .orderBy("source")
    )


# ------------------------------------------------ minhash calibration


def _minhash_calibration_sql() -> str:
    """Composes the registered q_dedup_minhash_md5 oracle as the
    candidate CTE (the CLAUDE.md oracle-composition pattern), then
    re-derives the IDENTICAL distinct-gram sets to score each
    candidate pair's exact Jaccard — integer-exact via the
    (c*1e6) // union cross-engine division bridge."""
    from processor_spark import registry as _registry_mod

    cand = _registry_mod._REGISTRY["q_dedup_minhash_md5"].sql
    return f"""
    WITH cand AS (
      SELECT doc_a, doc_b, est_jaccard FROM ({cand}) mh
    ), toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS tok,
             generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id,
             tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS gram
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(tok, 2) OVER w IS NOT NULL
    ), sized AS (
      SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
    ), overlap AS (
      SELECT p.doc_a, p.doc_b, count(*) AS n_common
      FROM cand p
      JOIN grams a ON a.doc_id = p.doc_a
      JOIN grams b ON b.doc_id = p.doc_b AND b.gram = a.gram
      GROUP BY 1, 2
    ), scored AS (
      SELECT CAST(floor(p.est_jaccard * 10000.0 + 0.5) AS BIGINT) AS est_e4,
             CAST((coalesce(o.n_common, 0) * 1000000)
                  // (sa.n_grams + sb.n_grams - coalesce(o.n_common, 0)) AS BIGINT) AS ex_e6
      FROM cand p
      LEFT JOIN overlap o ON o.doc_a = p.doc_a AND o.doc_b = p.doc_b
      JOIN sized sa ON sa.doc_id = p.doc_a
      JOIN sized sb ON sb.doc_id = p.doc_b
    )
    SELECT est_e4,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(CAST(sum(ex_e6) AS BIGINT) // count(*) AS BIGINT) AS mean_ex_e6,
           CAST(min(ex_e6) AS BIGINT) AS min_ex_e6,
           CAST(max(ex_e6) AS BIGINT) AS max_ex_e6
    FROM scored
    GROUP BY est_e4
    ORDER BY est_e4
    """


@register("q_minhash_calibration", sql=_minhash_calibration_sql())
def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy calibration: for every MinHash/LSH candidate
    pair, the exact 3-gram Jaccard, grouped by the 8-permutation
    estimate — the acceptance report a dedup rollout reads before
    trusting the sketch (does est 0.875 really mean ~0.8+ exact?).

    The candidate set comes from the registered q_dedup_minhash_md5
    builder (reentrancy-safe invocation); exact Jaccard is computed
    ONLY for candidate pairs (pair-list-bounded, never all-pairs) from
    the identical distinct-gram sets, with the integer-division bridge
    keeping every emitted value exact.

    Scale shape: candidates are band-capped (C(64,2) per bucket max);
    the exact-scoring join touches only candidate docs' gram sets —
    the evaluation cost scales with the candidate count, not the
    corpus."""
    # NB (r15): cand is referenced twice below; an outer persist was
    # TRIED and showed no benefit (3.32 s unpersisted vs 4.47 s
    # persisted vs 4.58 s unpersisted again — the hour's ambient shift
    # swamped the A/B; md5 canary steady ~0.85 while host loadavg ran
    # 4→8).  The minhash pipeline's own internal persists already
    # cache-serve the second reference, so the status quo stands
    # (the r8 adjudication class: persist only what is expensive to
    # rebuild AND not already cached).
    cand = q_dedup_minhash_md5(spark, sf_dir)
    d = load(spark, sf_dir, "documents", spread=True)
    grams = (
        d.select("doc_id", _tokens(F.col("text")).alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", F.explode(F.expr(_GRAM3_EXPR)).alias("gram"))
        .distinct()
    )
    grams = scoped_persist(grams)
    sized = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    ga = grams.select(F.col("doc_id").alias("doc_a"), "gram")
    gb = grams.select(F.col("doc_id").alias("gb_doc"), F.col("gram").alias("gram_b"))
    overlap = (
        cand.select("doc_a", "doc_b")
        .join(ga, "doc_a")
        .join(gb, (F.col("doc_b") == F.col("gb_doc")) & (F.col("gram") == F.col("gram_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sized.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sized.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    scored = (
        cand.join(overlap, ["doc_a", "doc_b"], "left")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.floor(F.col("est_jaccard") * 10000.0 + 0.5).cast("long").alias("est_e4"),
            F.expr(
                "CAST((coalesce(n_common, 0) * 1000000)"
                " div (na + nb - coalesce(n_common, 0)) AS BIGINT)"
            ).alias("ex_e6"),
        )
    )
    return (
        scored.groupBy("est_e4")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.expr("CAST(CAST(sum(ex_e6) AS BIGINT) div count(*) AS BIGINT)").alias(
                "mean_ex_e6"
            ),
            F.min("ex_e6").cast("long").alias("min_ex_e6"),
            F.max("ex_e6").cast("long").alias("max_ex_e6"),
        )
        .orderBy("est_e4")
    )


# ------------------------------------------------------------ dedup report


def _dedup_report_sql() -> str:
    """One-row corpus dedup report composing three registered oracles
    as scalar subqueries (the oracle-composition pattern) — the
    summary a pipeline run logs before deciding which dedup rung to
    apply."""
    from processor_spark import registry as _registry_mod

    exact = _registry_mod._REGISTRY["q_dedup_exact"].sql
    mh = _registry_mod._REGISTRY["q_dedup_minhash_md5"].sql
    ng = _registry_mod._REGISTRY["q_dedup_ngram"].sql
    return f"""
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
      (SELECT CAST(count(*) AS BIGINT) FROM ({exact}) e) AS n_exact_groups,
      (SELECT CAST(coalesce(sum(n_copies - 1), 0) AS BIGINT)
         FROM ({exact}) e WHERE n_copies > 1) AS n_exact_dup_docs,
      (SELECT CAST(count(*) AS BIGINT) FROM ({mh}) m) AS n_minhash_cand,
      (SELECT CAST(count(*) AS BIGINT) FROM ({mh}) m
        WHERE est_jaccard >= 0.5) AS n_minhash_ge50,
      (SELECT CAST(count(*) AS BIGINT) FROM ({ng}) g) AS n_ngram_pairs
    """


@register("q_dedup_report", sql=_dedup_report_sql())
def q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus dedup report: document count, exact-duplicate groups and
    surplus copies, MinHash/LSH candidate volume (total and >= 0.5
    estimate), and verified n-gram near-dup pairs — one row summarizing
    the whole dedup ladder, each number produced by the SAME registered
    builder the individual keys use (reentrancy-safe invocation), so
    the composed hash oracle certifies the ladder end to end.

    Scale shape: three bounded pipelines plus scalar counts; nothing
    beyond what the composed keys already cost."""
    d = load(spark, sf_dir, "documents")
    exact = q_dedup_exact(spark, sf_dir)
    mh = q_dedup_minhash_md5(spark, sf_dir)
    ng = q_dedup_ngram(spark, sf_dir)
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    # ONE agg per component — a second .agg() on the same DataFrame
    # would recompute the whole upstream pipeline (no auto CTE
    # materialization; the 64x probe measured the report at 2x the
    # component sum before this fold)
    ex_stats = exact.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact_groups"),
        F.coalesce(
            F.sum(F.when(F.col("n_copies") > 1, F.col("n_copies") - 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_exact_dup_docs"),
    )
    mh_stats = mh.agg(
        F.count(F.lit(1)).cast("long").alias("n_minhash_cand"),
        F.sum(F.when(F.col("est_jaccard") >= 0.5, 1).otherwise(0))
        .cast("long")
        .alias("n_minhash_ge50"),
    )
    n_ng = ng.agg(F.count(F.lit(1)).cast("long").alias("n_ngram_pairs"))
    return n_docs.crossJoin(ex_stats).crossJoin(mh_stats).crossJoin(n_ng)


# ------------------------------------------------------------ LSH recall


def _lsh_recall_sql() -> str:
    """Truth = verified n-gram near-dup pairs (>= 0.5 Jaccard); found =
    MinHash/LSH band candidates.  Both composed from their registered
    oracles (the q_ann_recall pattern applied to the dedup tier)."""
    from processor_spark import registry as _registry_mod

    truth = _registry_mod._REGISTRY["q_dedup_ngram"].sql
    cand = _registry_mod._REGISTRY["q_dedup_minhash_md5"].sql
    return f"""
    WITH truth AS (
      SELECT doc_a, doc_b FROM ({truth}) t
    ), cand AS (
      SELECT doc_a, doc_b FROM ({cand}) c
    )
    SELECT CAST(count(*) AS BIGINT) AS n_true,
           CAST(count(c.doc_a) AS BIGINT) AS n_found,
           CAST(CASE WHEN count(*) > 0
                     THEN (count(c.doc_a) * 1000000) // count(*)
                     ELSE 0 END AS BIGINT) AS recall_e6
    FROM truth t
    LEFT JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
    """


@register("q_lsh_recall", sql=_lsh_recall_sql())
def q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-generation recall of the MinHash/LSH banding against
    the verified n-gram near-duplicate truth set — the other half of
    the sketch acceptance report (q_minhash_calibration measures
    estimate ACCURACY on found pairs; this measures which true pairs
    the bands MISS, the S-curve's false-negative tail plus any
    df-cap suppression).

    Both sides are the registered builders (reentrancy-safe), so the
    single-row recall gets a full composed hash oracle.

    Scale shape: the two bounded pipelines plus a pair-keyed join on
    the (small) truth set."""
    truth = q_dedup_ngram(spark, sf_dir).select("doc_a", "doc_b")
    cand = q_dedup_minhash_md5(spark, sf_dir).select("doc_a", "doc_b").withColumn(
        "hit", F.lit(1)
    )
    return truth.join(cand, ["doc_a", "doc_b"], "left").agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.count("hit").cast("long").alias("n_found"),
        F.expr(
            "CAST(CASE WHEN count(*) > 0"
            " THEN (count(hit) * 1000000) div count(*) ELSE 0 END AS BIGINT)"
        ).alias("recall_e6"),
    )


# -------------------------------- exact set-similarity join (PPJoin, r10)

SETSIM_GRAMS = 3  # shingle width (the ladder's 3-gram unit)
SETSIM_POST_CAP = NGRAM_DF_CAP  # per-gram prefix-posting size above which
# pair generation switches from a local sorted-array expansion to a
# distributed self-join on the gram — the cap picks the STRATEGY, never
# the coverage, so the join stays exact at every scale (unlike
# NGRAM_DF_CAP, which may drop grams because near-dup candidate
# generation tolerates it; an exact join cannot).
# Jaccard threshold 4/5 as an exact rational: 5*inter >= 4*union — the
# integer cross-multiply keeps the whole key float-free.  4/5 is the
# high-similarity regime this join exists for (the fixture's true
# near-dup pairs all sit at J >= 0.9); it buys a ~t/5 prefix instead
# of the ~t/2 a 0.5 threshold would force, which is the whole
# selectivity story of prefix filtering.

_SETSIM_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
      FROM documents
    ), g AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(tk) - 1),
               i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS s
      FROM toks WHERE len(tk) >= 3
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.s, b.s)) AS inter,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
      FROM g a JOIN g b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(inter AS BIGINT) AS inter_grams,
           CAST(uni AS BIGINT) AS union_grams,
           CAST((inter * 1000) // uni AS BIGINT) AS jaccard_permille
    FROM pairs WHERE 5 * inter >= 4 * uni
    ORDER BY doc_a, doc_b
    """


@register("q_join_setsim", sql=_SETSIM_SQL)
def q_join_setsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join at Jaccard >= 4/5 over 3-gram
    shingle sets, computed with prefix filtering instead of the
    all-pairs join the oracle runs: under a global rarest-first
    (df, gram) order, any pair with J >= t must share a gram in each
    side's first |s| - ceil(t*|s|) + 1 grams — so only those ~|s|/5
    prefix grams are posted, candidates are pairs sharing a posted
    gram, and a pre-verify length filter (5*min(|a|,|b|) >= 4*max:
    J >= 4/5 forces it) prunes size-mismatched candidates before the
    exact array_intersect verification.  The oracle is the naive
    theta join, so the hash match PROVES the prefix cover is complete
    (the q_join_spatial contract, applied to similarity joins).

    PPJoin positional filter (sound, r11): every candidate site
    carries the gram's 1-indexed position (pa, pb) in each doc's
    rarest-first sorted array.  Per pair, let c = number of shared
    prefix sites and (pa*, pb*) the positions at the globally-largest
    shared site (arrays share one total (df, gram) order, so max(pa)
    and max(pb) are the same site).  Any OTHER shared gram lies
    beyond at least one prefix, hence globally after that site, hence
    after position pa* in a AND pb* in b — so
    inter <= c + min(ta - pa*, tb - pb*), and pairs with
    9*ubound < 4*(ta + tb) (the J >= 4/5 overlap requirement,
    cross-multiplied) are pruned BEFORE the exact verify.  The naive
    oracle hash-proves soundness: a dropped true pair would mismatch.

    Posting-size cap (exact, r11): prefix posting lists larger than
    SETSIM_POST_CAP switch from single-task local array expansion to
    a distributed self-join on the gram (AQE skew-join splits the
    heavy partitions) — the cap bounds per-task work, never coverage,
    so exactness survives 100 TB.  The verify joins are plain equi
    joins sized by the runtime (r10's corpus-sized F.broadcast wraps
    removed — the session's AQE broadcast policy decides, matching
    q_dedup_ngram's verify join).

    Everything is integer (sizes, positions, intersections,
    cross-multiplied thresholds, permille division) — no float
    surface.  Scale shape: one df window over the distinct gram
    stream, per-doc sort of its own grams, posting lists only for
    PREFIX grams (the rarest fifth of each doc), bounded-task pair
    generation, per-pair positional prune, then a verification join
    bounded by the surviving candidate count."""
    d = load(spark, sf_dir, "documents", spread=True)
    base = d.select("doc_id", _tokens(F.col("text")).alias("toks")).where(
        F.size("toks") >= 3
    )
    grams = base.select(
        "doc_id", F.explode(F.array_distinct(F.expr(_GRAM3_EXPR))).alias("gram")
    )
    wdf = Window.partitionBy("gram")
    ranked = grams.withColumn("df", F.count(F.lit(1)).over(wdf))
    # per-doc (df, gram) struct array in global rarest-first order +
    # set size; referenced by the prefix stream AND both verify joins
    # (cheap to rebuild — persist adjudicated a wash at sf0.1, r10).
    # Keeping df INSIDE the struct lets the posting-size split reuse
    # the already-computed document frequency (prefix posting count
    # <= full df, so df <= cap soundly implies posting <= cap) —
    # no second window over the prefix stream.
    sets = ranked.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("df", "gram"))).alias("sg")
    ).withColumn("t", F.size("sg"))
    # prefix length for theta = 4/5: t - ceil(4t/5) + 1; posexplode
    # keeps each gram's 1-indexed position for the positional filter
    prefix = sets.select(
        "doc_id",
        "t",
        F.posexplode(
            F.slice(F.col("sg"), 1, F.expr("t - ((4 * t + 4) div 5) + 1"))
        ).alias("pos0", "g"),
    ).select(
        "doc_id",
        "t",
        (F.col("pos0") + 1).alias("pos"),
        F.col("g.gram").alias("gram"),
        F.col("g.df").alias("df"),
    )
    # candidate SITES (one per shared prefix gram per pair), with the
    # length filter (5*min(ta,tb) >= 4*max: J >= 4/5 forces it)
    # applied at the site so oversize mismatches never materialize.
    # Small postings: local pair generation from the sorted array.
    pair_expr = (
        "flatten(transform(ds, (x, i) -> "
        "filter(transform(slice(ds, i + 2, size(ds)), "
        "y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
        "x.t AS ta, y.t AS tb, x.pos AS pa, y.pos AS pb)), "
        "p -> 5 * least(p.ta, p.tb) >= 4 * greatest(p.ta, p.tb))))"
    )
    low_sites = (
        prefix.where(F.col("df") <= SETSIM_POST_CAP)
        .groupBy("gram")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "t", "pos"))).alias("ds"))
        .where(F.size("ds") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.*")
    )
    # heavy postings (empty at fixture scale, the 100 TB guard):
    # distributed equi self-join on the gram — C(df, 2) pairs spread
    # by AQE skew handling instead of one C(df, 2)-dense array task
    ph = prefix.where(F.col("df") > SETSIM_POST_CAP)
    hx, hy = ph.alias("hx"), ph.alias("hy")
    high_sites = (
        hx.join(hy, "gram")
        .where(F.col("hx.doc_id") < F.col("hy.doc_id"))
        .where(
            5 * F.least("hx.t", "hy.t") >= 4 * F.greatest("hx.t", "hy.t")
        )
        .select(
            F.col("hx.doc_id").alias("doc_a"),
            F.col("hy.doc_id").alias("doc_b"),
            F.col("hx.t").alias("ta"),
            F.col("hy.t").alias("tb"),
            F.col("hx.pos").alias("pa"),
            F.col("hy.pos").alias("pb"),
        )
    )
    # per-pair positional prune: ubound = c + min(ta - pa*, tb - pb*)
    cands = (
        low_sites.unionByName(high_sites)
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.max("ta").alias("ta"),
            F.max("tb").alias("tb"),
            F.max("pa").alias("pa_max"),
            F.max("pb").alias("pb_max"),
        )
        .where(
            9
            * (
                F.col("c")
                + F.least(
                    F.col("ta") - F.col("pa_max"), F.col("tb") - F.col("pb_max")
                )
            )
            >= 4 * (F.col("ta") + F.col("tb"))
        )
        .select("doc_a", "doc_b")
    )
    gram_arr = F.transform(F.col("sg"), lambda x: x["gram"])
    verified = (
        cands.join(
            sets.select(F.col("doc_id").alias("doc_a"), gram_arr.alias("sa"),
                        F.col("t").alias("ta")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), gram_arr.alias("sb"),
                        F.col("t").alias("tb")),
            "doc_b",
        )
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")).cast("long"))
        .withColumn("uni", (F.col("ta") + F.col("tb") - F.col("inter")).cast("long"))
        .where(5 * F.col("inter") >= 4 * F.col("uni"))
    )
    return verified.select(
        "doc_a",
        "doc_b",
        F.col("inter").alias("inter_grams"),
        F.col("uni").alias("union_grams"),
        F.expr("(inter * 1000) div uni").alias("jaccard_permille"),
    ).orderBy("doc_a", "doc_b")


# ------------------------------- winnowing fingerprints (MOSS, r10)

WINNOW_K = 4      # k-gram width (tokens per gram)
WINNOW_W = 5      # winnowing window (grams per window)
# guarantee: any shared token run of length >= K + W - 1 (= 8) yields
# at least one shared fingerprint — the MOSS coverage bound.
_WINNOW_POS_CAP = 32000  # 15-bit position packs beside the 48-bit hash

_WINNOW_HS = (
    "slice(transform(sequence(0, size(toks) - 4),"
    " i -> cast(conv(substring(md5(cast("
    "concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3])"
    " as binary)), 1, 12), 16, 10) as bigint)), 1, 32000)"
)
_WINNOW_SEL = (
    "array_distinct(transform(sequence(0, size(hs) - 5), i -> "
    "array_min(slice(hs, i + 1, 5)) * 32768"
    " + i + array_position(slice(hs, i + 1, 5), array_min(slice(hs, i + 1, 5)))))"
)

_WINNOW_SQL = """
    WITH toks AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS tk
      FROM documents
    ), hsd AS (
      SELECT doc_id, source,
             (list_transform(range(1, len(tk) - 2),
                i -> CAST(('0x' || substr(md5(
                  tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                ), 1, 12)) AS BIGINT)))[1:32000] AS hs
      FROM toks WHERE len(tk) >= 8
    ), sel AS (
      SELECT doc_id, source,
             list_distinct(list_transform(range(0, len(hs) - 4),
               i -> list_min(hs[i+1 : i+5]) * 32768
                    + i + list_position(hs[i+1 : i+5], list_min(hs[i+1 : i+5])))) AS fps
      FROM hsd WHERE len(hs) >= 5
    ), fp AS (
      SELECT doc_id, source, unnest(fps) // 32768 AS fph FROM sel
    ), dfp AS (
      SELECT DISTINCT doc_id, source, fph FROM fp
    ), marked AS (
      SELECT source, fph,
             min(doc_id) OVER (PARTITION BY fph) <> max(doc_id) OVER (PARTITION BY fph) AS shared
      FROM dfp
    )
    SELECT s.source,
           CAST(count(DISTINCT s.doc_id) AS BIGINT) AS n_docs,
           CAST(sum(len(s.fps)) AS BIGINT) AS n_fps,
           CAST((SELECT count(DISTINCT m.fph) FROM marked m
                 WHERE m.source = s.source) AS BIGINT) AS n_distinct_hash,
           CAST((SELECT count(DISTINCT m.fph) FROM marked m
                 WHERE m.source = s.source AND m.shared) AS BIGINT) AS n_shared_hash
    FROM sel s GROUP BY s.source ORDER BY s.source
    """


@register("q_winnow_fingerprints", sql=_WINNOW_SQL)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): hash every
    4-token gram (48-bit md5 prefix — the engine-portable family),
    slide a 5-gram window, and keep each window's minimum hash tagged
    with its POSITION (leftmost-min tie-break; fingerprint = packed
    hash*2^15 + pos so the per-doc set dedups as plain int64s) — any
    shared token run of >= 8 tokens is GUARANTEED to surface at least
    one shared fingerprint, the coverage bound naive sampling lacks.
    Per-source report: fingerprint mass, distinct hash values, and the
    cross-document shared-hash count (the plagiarism/duplication mass,
    computed with the one-window min!=max trick — no self-join).

    All-integer after the digests -> full hash oracle.  Scale shape:
    one md5-dense narrow map per doc (spread=True), array-native
    window minima (no explode of the gram stream), then one exploded
    distinct-fingerprint stream into two hash aggs and a single
    fph-partitioned window.  Positions cap at 32000 grams/doc so the
    pack stays in 63 bits (at 100 TB, fingerprint long docs in
    32k-gram chunks)."""
    d = load(spark, sf_dir, "documents", spread=True)
    base = d.select(
        "doc_id", "source", _tokens(F.col("text")).alias("toks")
    ).where(F.size("toks") >= 8)
    # NO size(hs) filter here: size(toks) >= 8 already guarantees >= 5
    # grams, and a predicate referencing hs would inline the whole
    # md5-transform expression into the Filter AND into every hs
    # reference inside the winnow lambda (the r7 Catalyst
    # project-collapse hazard) — measured 20x slower at sf0.1.
    hsd = base.select("doc_id", "source", F.expr(_WINNOW_HS).alias("hs"))
    sel = hsd.select("doc_id", "source", F.expr(_WINNOW_SEL).alias("fps"))
    sel = scoped_persist(sel)  # feeds the per-source size agg AND the fp stream
    fp = sel.select(
        "doc_id", "source", F.explode("fps").alias("p")
    ).select("doc_id", "source", F.expr("p div 32768").alias("fph")).distinct()
    # shared flag per hash as a HASH AGG (min(doc)!=max(doc) — map-side
    # combinable), not a window: no consumer needs per-row flags here,
    # so the window's sort is pure cost (the inverse of the
    # q_dedup_substring trade, where rows must keep their identity)
    gstat = fp.groupBy("fph").agg(
        (F.min("doc_id") != F.max("doc_id")).alias("shared")
    )
    per_source_hash = (
        fp.select("source", "fph")
        .distinct()
        .join(gstat, "fph")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_hash"),
            F.sum(F.when(F.col("shared"), 1).otherwise(0))
            .cast("long")
            .alias("n_shared_hash"),
        )
    )
    per_source_mass = sel.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum(F.size("fps")).cast("long").alias("n_fps"),
    )
    return (
        per_source_mass.join(per_source_hash, "source")
        .select("source", "n_docs", "n_fps", "n_distinct_hash", "n_shared_hash")
        .orderBy("source")
    )
