"""Scalar function families (SURVEY.md §2.8).

One declared query per family; each exercises the family's
representative functions on a fixture table.  All JVM built-ins —
these queries are narrow projections (no shuffle at all) and exist to
pin down cross-engine semantics: 1-based substring, null-safe
equality, ns→µs timestamps, DuckDB's 0-based dayofweek vs Spark's
1-based, etc.  Divergent conventions are reconciled *in the oracle
SQL*, never by post-processing results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_spark.registry import register
from processor_spark.sources import load


@register(
    "q_str_funcs",
    sql="""
    SELECT c_custkey,
           upper(c_name)                                   AS name_uc,
           lower(c_mktsegment)                             AS seg_lc,
           length(c_name)                                  AS name_len,
           substring(c_name, 1, 8)                         AS name_head,
           concat_ws('|', c_mktsegment, c_name)            AS tagged,
           trim(c_name)                                    AS name_trim,
           replace(c_name, '#', '-')                       AS name_dash,
           regexp_extract(c_name, '([0-9]+)', 1)           AS name_num,
           levenshtein(c_mktsegment, 'BUILDING')           AS seg_dist,
           CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END   AS has_one,
           split_part(c_name, '#', 2)                      AS name_tail
    FROM customer
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, length, substring, concat, trim, replace,
    regexp_extract, levenshtein, LIKE, split_part."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_uc"),
        F.lower("c_mktsegment").alias("seg_lc"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_head"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.trim(F.col("c_name")).alias("name_trim"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dash"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_num"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_dist"),
        F.when(F.col("c_name").like("%1%"), 1).otherwise(0).alias("has_one"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_tail"),
    )


@register(
    "q_date_funcs",
    sql="""
    SELECT o_orderkey,
           year(o_orderdate)                                  AS y,
           month(o_orderdate)                                 AS m,
           day(o_orderdate)                                   AS d,
           quarter(o_orderdate)                               AS q,
           dayofweek(o_orderdate) + 1                         AS dow,           -- DuckDB 0=Sun; Spark 1=Sun
           date_trunc('month', o_orderdate)                   AS month_start,
           datediff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
           o_orderdate + INTERVAL 90 DAY                      AS due_date,
           CAST(floor(epoch(o_orderdate)) AS BIGINT)          AS epoch_s,
           strftime(o_orderdate, '%Y-%m-%d')                  AS iso_day
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract parts, truncate, diff, interval math,
    epoch, formatting.  dayofweek convention bridged in the oracle."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.lit("2000-01-01 00:00:00").cast("timestamp"), F.col("o_orderdate")
        ).alias("days_to_y2k"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@register(
    "q_math_funcs",
    sql="""
    SELECT p_partkey,
           round(p_retailprice, 1)                    AS price_r1,
           CAST(floor(p_retailprice) AS BIGINT)       AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT)        AS price_ceil,
           abs(p_size - 25)                           AS size_dev,
           round(sqrt(p_retailprice), 6)              AS price_sqrt,
           round(ln(p_retailprice + 1), 6)            AS price_ln,
           round(log10(p_retailprice + 1), 6)         AS price_log10,
           round(pow(p_size, 2), 1)                   AS size_sq,
           CAST(sign(p_size - 25) AS DOUBLE)          AS size_sign,
           greatest(p_size, 10)                       AS size_min10,
           least(p_size, 40)                          AS size_max40,
           p_size % 7                                 AS size_mod
    FROM part
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: rounding, roots, logs, powers, sign, clamps, modulo."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_r1"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1), 6).alias("price_ln"),
        F.round(F.log10(F.col("p_retailprice") + 1), 6).alias("price_log10"),
        F.round(F.pow("p_size", F.lit(2)), 1).alias("size_sq"),
        F.signum(F.col("p_size") - 25).cast("double").alias("size_sign"),
        F.greatest("p_size", F.lit(10)).alias("size_min10"),
        F.least("p_size", F.lit(40)).alias("size_max40"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


@register(
    "q_array_funcs",
    sql="""
    SELECT vec_id,
           len(embedding)                                          AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6)                  AS first_dim,
           round(CAST(list_max(embedding) AS DOUBLE), 6)           AS max_dim,
           round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 6)
                                                                   AS sq_norm,
           round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 6)
                                                                   AS l1_norm,
           round(CAST(list_sort(embedding)[len(embedding) - 1] AS DOUBLE), 6)
                                                                   AS second_max,
           len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS n_positive,
           round(list_sum(CAST(list_slice(embedding, 1, 8) AS DOUBLE[])), 6) AS head_sum
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family on embeddings: size/element_at/max/sort/slice and
    lambda forms (transform/filter/aggregate) — the fold (aggregate)
    is the same primitive the similarity ops build on."""
    e = load(spark, sf_dir, "embeddings")
    emb_d = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(emb_d, 1), 6).alias("first_dim"),
        F.round(F.array_max(emb_d), 6).alias("max_dim"),
        F.round(
            F.aggregate(F.transform(emb_d, lambda x: x * x), F.lit(0.0), lambda a, x: a + x),
            6,
        ).alias("sq_norm"),
        F.round(
            F.aggregate(F.transform(emb_d, F.abs), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("l1_norm"),
        F.round(
            F.element_at(F.array_sort(emb_d), F.size("embedding") - 1), 6
        ).alias("second_max"),
        F.size(F.filter(emb_d, lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(F.slice(emb_d, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head_sum"),
    )


@register(
    "q_map_funcs",
    sql="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER)  AS k_val,
           json_keys(props)[1]                          AS first_key,
           len(json_keys(props))                        AS n_keys
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: props parsed to MapType; keys/values/element_at."""
    e = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "q_json_funcs",
    sql="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER)            AS k_typed,
           json_extract_string(props, '$.k')                      AS k_str,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END          AS is_valid,
           json_object('id', event_id, 'type', event_type)        AS rebuilt
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: schema-on-read (from_json), path extraction
    (get_json_object), validity probe, and re-serialization (to_json)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k_typed"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.when(F.from_json("props", "k INT").isNotNull(), 1).otherwise(0).alias("is_valid"),
        F.to_json(
            F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("type"))
        ).alias("rebuilt"),
    )


@register(
    "q_hash_funcs",
    sql="""
    SELECT doc_id,
           md5(text)          AS text_md5,
           sha256(text)       AS text_sha256
    FROM documents
    """,
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family: engine-portable digests (md5/sha256) for content
    addressing; xxhash64 (Spark-side only, used by dedup internals) is
    excluded from the oracle because its seed is engine-specific."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha256"),
    )


@register(
    "q_cast_funcs",
    sql="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR)  AS price_dec_str,
           CAST(floor(o_totalprice) AS BIGINT)                   AS price_int,
           CAST(o_orderkey AS VARCHAR)                           AS key_str,
           TRY_CAST(o_orderstatus AS INTEGER)                    AS status_as_int,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR)            AS order_day,
           CASE WHEN o_orderstatus IS NOT DISTINCT FROM 'O' THEN 1 ELSE 0 END AS is_open
    FROM orders
    """,
)
def q_cast_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast/coercion family: decimal money casts (stringified for a
    representation-stable oracle), try_cast → NULL on failure,
    timestamp→date, null-safe equality (<=>).

    spread=True: a try_cast that FAILS costs a caught JVM exception per
    row (measured ~13 µs/row vs ~1 µs for a clean cast), and the
    single-file fixture scan would run that on one core."""
    o = load(spark, sf_dir, "orders", spread=True)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(14,2)").cast("string").alias("price_dec_str"),
        F.floor("o_totalprice").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderstatus").try_cast("int").alias("status_as_int"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_day"),
        F.when(F.col("o_orderstatus").eqNullSafe(F.lit("O")), 1).otherwise(0).alias("is_open"),
    )


@register(
    "q_bit_funcs",
    sql="""
    SELECT p_partkey,
           p_size & 12                        AS b_and,
           p_size | 3                         AS b_or,
           xor(p_size, 5)                     AS b_xor,
           CAST(p_size << 2 AS INTEGER)       AS b_shl,
           CAST(p_size >> 1 AS INTEGER)       AS b_shr,
           ~p_size                            AS b_not
    FROM part
    """,
)
def q_bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts/not (hash bucketing, bitmap and
    flag manipulation at scale are built from exactly these)."""
    p = load(spark, sf_dir, "part")
    sz = F.col("p_size")
    return p.select(
        "p_partkey",
        sz.bitwiseAND(F.lit(12)).alias("b_and"),
        sz.bitwiseOR(F.lit(3)).alias("b_or"),
        sz.bitwiseXOR(F.lit(5)).alias("b_xor"),
        F.shiftleft(sz, 2).alias("b_shl"),
        F.shiftright(sz, 1).alias("b_shr"),
        F.bitwise_not(sz).alias("b_not"),
    )


@register(
    "q_str_funcs2",
    sql="""
    SELECT p_partkey,
           lpad(p_brand, 12, '.')                       AS brand_pad,
           rpad(p_type, 20, '_')                        AS type_pad,
           reverse(p_brand)                             AS brand_rev,
           repeat('-', p_size % 5)                      AS dashes,
           ascii(p_name)                                AS first_code,
           left(p_name, 6)                              AS head6,
           right(p_name, 4)                             AS tail4,
           CAST(strpos(p_type, 'a') AS INTEGER)         AS a_pos,
           CASE WHEN contains(p_type, 'steel') THEN 1 ELSE 0 END AS is_steel
    FROM part
    """,
)
def q_str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family 2: padding, reverse, repeat, ascii, left/right,
    position, containment."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, ".").alias("brand_pad"),
        F.rpad("p_type", 20, "_").alias("type_pad"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5).cast("int")).alias("dashes"),
        F.ascii("p_name").alias("first_code"),
        F.substring("p_name", 1, 6).alias("head6"),
        F.substring(F.col("p_name"), -4, 4).alias("tail4"),
        F.instr(F.col("p_type"), "a").alias("a_pos"),
        F.when(F.col("p_type").contains("steel"), 1).otherwise(0).alias("is_steel"),
    )


@register(
    "q_date_funcs2",
    sql="""
    SELECT o_orderkey,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)     AS month_end,
           o_orderdate + INTERVAL 2 MONTH                           AS plus_2mo,
           CAST(weekofyear(o_orderdate) AS INTEGER)                 AS iso_week,
           CAST(dayofyear(o_orderdate) AS INTEGER)                  AS doy,
           CAST(isodow(o_orderdate) AS INTEGER)                     AS iso_dow,
           date_trunc('quarter', o_orderdate)                       AS quarter_start
    FROM orders
    """,
)
def q_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family 2: last_day, month arithmetic (end-of-month clamped the
    same way in both engines), ISO week/day-of-week, day-of-year,
    quarter truncation."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.add_months("o_orderdate", 2).cast("timestamp_ntz").alias("plus_2mo"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.expr("weekday(o_orderdate) + 1").alias("iso_dow"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
    )


@register(
    "q_variant_funcs",
    sql="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract(props, '$.k') AS VARCHAR) AS k_raw
    FROM events
    """,
)
def q_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4): parse_json into an
    open-schema value, typed extraction via variant_get — the
    schema-on-read path that scales to heterogeneous props without
    declaring a struct up front."""
    e = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_raw"),
    )


@register(
    "q_regexp_funcs",
    sql=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER)       AS n_words,
           CAST(len(regexp_extract_all(text, '\bthe\b')) AS INTEGER)      AS n_the,
           regexp_matches(text, '\bdata\b')                               AS has_data,
           regexp_extract(substr(text, 1, 40), '([a-z]+) ([a-z]+)', 2)    AS second_word,
           regexp_replace(substr(text, 1, 40), '([aeiou])', '<\1>', 'g')  AS vowels_marked,
           regexp_replace(substr(text, 1, 40), '\s+', '_', 'g')           AS snake
    FROM documents
    """,
)
def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family: extract_all (explicit idx=0 — Spark 4 requires it
    for group-free patterns), count, like, group extraction, global
    replace with backreference ($1 in Spark vs \\1 in DuckDB — bridged
    in the oracle SQL).  All JVM-side, no shuffle."""
    d = load(spark, sf_dir, "documents")
    head = F.substring("text", 1, 40)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+"), 0)).alias("n_words"),
        F.regexp_count("text", F.lit(r"\bthe\b")).alias("n_the"),
        F.regexp_like("text", F.lit(r"\bdata\b")).alias("has_data"),
        F.regexp_extract(head, r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_replace(head, r"([aeiou])", r"<$1>").alias("vowels_marked"),
        F.regexp_replace(head, r"\s+", "_").alias("snake"),
    )


@register(
    "q_try_funcs",
    sql="""
    SELECT o_orderkey,
           round(o_totalprice / NULLIF(o_orderkey % 7, 0), 4)   AS div7,
           TRY_CAST(o_orderpriority AS INTEGER)                 AS pri_int,
           TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS pri_num,
           CASE WHEN o_orderkey = 0 THEN 0
                WHEN o_orderkey = 1 THEN 9223372036854775807
                ELSE NULL END                                   AS ovf_mul,
           str_split(o_orderpriority, '-')[2]                   AS pri_word,
           str_split(o_orderpriority, '-')[5]                   AS pri_missing
    FROM orders
    """,
)
def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode escape hatches (Spark 4 runs ANSI ON): try_divide
    (NULL on /0 instead of error), try_cast, try_multiply (NULL on
    int64 overflow — oracle states the expected value since DuckDB's
    vectorized CASE would itself overflow), try_element_at past the
    end.  The family every ANSI pipeline needs for dirty data.

    spread=True: every failing try_* costs a caught JVM exception per
    row (try_multiply overflowing all 150 k rows measured 3.3 s on one
    core; ~22 µs/row of exception unwinding) — the per-row cost is
    inherent to the escape-hatch semantics, so parallelize it."""
    o = load(spark, sf_dir, "orders", spread=True)
    parts = F.split("o_orderpriority", "-")
    return o.select(
        "o_orderkey",
        F.round(F.try_divide("o_totalprice", F.col("o_orderkey") % 7), 4).alias("div7"),
        F.col("o_orderpriority").try_cast("int").alias("pri_int"),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1)).try_cast("int").alias(
            "pri_num"
        ),
        F.try_multiply("o_orderkey", F.lit(9223372036854775807)).alias("ovf_mul"),
        F.try_element_at(parts, F.lit(2)).alias("pri_word"),
        F.try_element_at(parts, F.lit(5)).alias("pri_missing"),
    )


@register(
    "q_array_funcs2",
    sql="""
    SELECT o_orderkey,
           array_to_string(list_sort(list_intersect(range(1, n + 1), [2,3,4])), ',')            AS arr_inter,
           array_to_string(list_sort(list_distinct(list_concat(range(1, n + 1), [4,9]))), ',')  AS arr_union,
           COALESCE(array_to_string(list_sort(list_filter(range(1, n + 1),
                                 x -> NOT list_contains([1,2], x))), ','), '') AS arr_exc,
           array_to_string(flatten([range(1, n + 1), [0]]), ',')               AS flat,
           CAST(len(list_intersect(range(1, n + 1), [5,6])) > 0 AS BOOLEAN)    AS overlaps56,
           CAST(COALESCE(list_position(range(1, n + 1), 3), 0) AS BIGINT)      AS pos3
    FROM (SELECT o_orderkey, o_orderkey % 5 + 2 AS n FROM orders)
    """,
)
def q_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family 2 — set algebra and generation: sequence,
    intersect/union/except (sorted canonically on both engines; DuckDB
    list_intersect order is unspecified), flatten, overlap test,
    position (Spark's 0-when-absent bridged via COALESCE).  Generated
    from keys so the oracle is pure SQL.  Array outputs are serialized
    to CSV strings on both sides — the driver hash can't take lists."""
    o = load(spark, sf_dir, "orders")
    n = (F.col("o_orderkey") % 5 + 2).cast("long")
    seq = F.sequence(F.lit(1).cast("long"), n)
    return o.select(
        "o_orderkey",
        F.array_join(F.array_sort(F.array_intersect(seq, F.array(F.lit(2), F.lit(3), F.lit(4)).cast("array<long>"))), ",").alias("arr_inter"),
        F.array_join(F.array_sort(F.array_union(seq, F.array(F.lit(4), F.lit(9)).cast("array<long>"))), ",").alias("arr_union"),
        F.array_join(F.array_sort(F.array_except(seq, F.array(F.lit(1), F.lit(2)).cast("array<long>"))), ",").alias("arr_exc"),
        F.array_join(F.flatten(F.array(seq, F.array(F.lit(0).cast("long")))), ",").alias("flat"),
        F.arrays_overlap(seq, F.array(F.lit(5), F.lit(6)).cast("array<long>")).alias("overlaps56"),
        F.array_position(seq, 3).alias("pos3"),
    )


@register(
    "q_url_funcs",
    sql="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
               || '?lang=' || lang || '&v=' || CAST(doc_id % 7 AS VARCHAR) AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, 'https://([^/]+)/', 1)      AS host,
           regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1)      AS q_lang,
           regexp_extract(url, '[?&]v=([^&]*)', 1)         AS q_v
    FROM urls
    """,
)
def q_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family: Spark's parse_url (HOST / PATH / QUERY with key) over
    synthetic document URLs; the oracle re-derives each component with
    anchored regexes (DuckDB has no URL parser).  parse_url is the
    idiomatic JVM-side path for web-corpus pipelines (host-level dedup,
    per-domain quotas, query stripping)."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        F.lit("&v="), (F.col("doc_id") % 7).cast("string"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        F.parse_url(url, F.lit("QUERY"), F.lit("v")).alias("q_v"),
    )


@register(
    "q_map_funcs2",
    sql="""
    WITH base AS (
      SELECT o_orderkey,
             o_orderkey % 100                                    AS kv,
             CAST(split_part(o_orderpriority, '-', 1) AS BIGINT) AS pv
      FROM orders
    )
    SELECT o_orderkey,
           'key=' || kv || ',pri=' || pv                                   AS entries,
           'key=' || kv * 2 || ',pri=' || pv * 2                           AS doubled,
           CASE WHEN kv > 10 AND pv > 10 THEN 'key=' || kv || ',pri=' || pv
                WHEN kv > 10 THEN 'key=' || kv
                WHEN pv > 10 THEN 'pri=' || pv
                ELSE '' END                                                AS filtered,
           'extra=1,key=' || kv || ',pri=' || pv                           AS merged,
           'key=' || kv + pv || ',pri=' || pv + kv                         AS zipped
    FROM base
    """,
)
def q_map_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family 2 — higher-order map functions (Spark 4):
    transform_values, map_filter, map_concat, map_zip_with.

    Maps can't cross the driver's value-hash (same limitation as
    arrays), so every result is serialized as sorted ``k=v`` CSV via
    map_entries → transform → array_sort → array_join.  The oracle
    computes the expected entries from first principles (DuckDB's MAP
    algebra is too thin to mirror the higher-order forms directly) —
    which makes this a true semantic check of Spark's map functions,
    not an echo of the same implementation.
    """
    # spread=True: five higher-order map serializations per row are
    # compute-dense, and the single-file fixture scan would otherwise
    # run them on one core (same fix as q_try_funcs, CLAUDE.md)
    o = load(spark, sf_dir, "orders", spread=True)
    kv = F.col("o_orderkey") % 100
    pv = F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1)).cast("long")
    m = F.create_map(F.lit("key"), kv, F.lit("pri"), pv)
    m2 = F.create_map(F.lit("key"), pv, F.lit("pri"), kv)

    def ser(mp) -> F.Column:
        return F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(mp),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"].cast("string")),
                )
            ),
            ",",
        )

    return o.select(
        "o_orderkey",
        ser(m).alias("entries"),
        ser(F.transform_values(m, lambda k, v: v * 2)).alias("doubled"),
        ser(F.map_filter(m, lambda k, v: v > 10)).alias("filtered"),
        ser(F.map_concat(m, F.create_map(F.lit("extra"), F.lit(1).cast("long")))).alias("merged"),
        ser(F.map_zip_with(m, m2, lambda k, v1, v2: v1 + v2)).alias("zipped"),
    )


@register(
    "q_struct_funcs",
    sql="""
    SELECT o_orderkey,
           to_json(struct_pack(id := o_orderkey, pri := o_orderpriority)) AS as_json,
           o_orderpriority                                                AS nested_pri,
           CAST(o_orderkey % 5 AS BIGINT)                                 AS nested_bucket,
           CASE WHEN o_orderkey % 5 = 0 THEN 'zero' ELSE 'nonzero' END    AS bucket_tag
    FROM orders
    """,
)
def q_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family: named_struct construction, nested field access
    through dot paths, struct → JSON serialization (both engines render
    compact ``{"k":v}`` JSON identically for int/string fields —
    doubles are excluded, their repr differs).
    """
    o = load(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderkey").alias("id"), F.col("o_orderpriority").alias("pri")
    )
    nested = F.struct(
        s.alias("inner"), (F.col("o_orderkey") % 5).alias("bucket")
    )
    return o.select(
        "o_orderkey",
        F.to_json(s).alias("as_json"),
        nested["inner"]["pri"].alias("nested_pri"),
        nested["bucket"].cast("long").alias("nested_bucket"),
        F.when(nested["bucket"] == 0, "zero").otherwise("nonzero").alias("bucket_tag"),
    )
