"""Scans & sources (SURVEY.md §2.1).

Scale notes: both queries rely on Catalyst pushing projection and
predicates into the vectorized Parquet reader — at 100 TB the pruned
scan reads only the referenced column chunks and skips row groups via
min/max stats.  tests/test_plans.py asserts PushedFilters/ReadSchema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_spark.registry import register
from processor_spark.sources import load


@register(
    "q_scan_parquet",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
    FROM lineitem
    """,
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan with schema projection (column pruning reaches the reader)."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate"
    )


@register(
    "q_scan_pruned",
    sql="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_quantity > 30.0
    """,
)
def q_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-pushed + column-pruned scan.

    The two range predicates and the quantity filter all appear as
    PushedFilters on the Parquet scan node; ReadSchema carries only the
    four referenced columns.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("l_quantity") > 30.0)
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


def _partitioned_copy(spark: SparkSession, sf_dir: str) -> str:
    """Materialize events as a Hive-style date-partitioned layout (once
    per sf_dir; _SUCCESS marker makes re-use cheap across sessions) —
    the 100 TB lake layout whose static + dynamic partition pruning
    q_scan_partitioned demonstrates."""
    import hashlib
    import os

    from processor_spark.sources.sinks import write_parquet_partitioned

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/processor_spark_part/{tag}/events"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        ev = load(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
        write_parquet_partitioned(ev, path, ["event_date"])
    return path


@register(
    "q_scan_partitioned",
    sql="""
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS event_date, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ), hot AS (
      SELECT DISTINCT CAST(ts AS DATE) AS event_date
      FROM events
      WHERE event_type = 'purchase' AND value > 300.0
    )
    SELECT strftime(e.event_date, '%Y-%m-%d') AS day,
           e.event_type,
           count(*) AS n_events,
           CAST(sum(e.cents) AS BIGINT) AS value_cents
    FROM ev e JOIN hot h USING (event_date)
    WHERE e.event_date >= DATE '2024-01-05' AND e.event_date < DATE '2024-01-20'
    GROUP BY 1, 2
    """,
)
def q_scan_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static + dynamic partition pruning over a date-partitioned lake
    layout — the #1 cost lever on a 100 TB date-partitioned fact table.

    events is written once per sf as a Hive-style layout partitioned by
    event_date; the query filters a literal date range (STATIC pruning:
    the listing never touches partitions outside [05, 20)) and joins a
    small filtered dim of "hot" purchase dates (DYNAMIC pruning: the
    broadcasted dim's dates are pushed into the partition listing as a
    runtime IN-subquery).  Both appear in the scan's PartitionFilters —
    asserted in tests/test_plans.py.  The oracle replays the identical
    rows from the original un-partitioned table (same data by
    construction); values are exact integer cents.
    """
    path = _partitioned_copy(spark, sf_dir)
    fact = spark.read.parquet(path)
    hot = (
        load(spark, sf_dir, "events")
        .where((F.col("event_type") == "purchase") & (F.col("value") > 300.0))
        .select(F.to_date("ts").alias("event_date"))
        .distinct()
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        fact.where(
            (F.col("event_date") >= F.lit("2024-01-05").cast("date"))
            & (F.col("event_date") < F.lit("2024-01-20").cast("date"))
        )
        .join(hot, "event_date")
        .groupBy(
            F.date_format("event_date", "yyyy-MM-dd").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("value_cents"),
        )
    )


def _orc_copy(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a 2-column lineitem projection as ORC (once per
    sf_dir; _SUCCESS marker makes re-use cheap across sessions) so the
    ORC read path is exercised against real data."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/processor_spark_orc/{tag}/lineitem"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_extendedprice")
            .write.mode("overwrite")
            .orc(path)
        )
    return path


@register(
    "q_scan_orc",
    sql="""
    SELECT l_returnflag, count(*) AS n_rows,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source path (SURVEY.md §2.1's 'other columnar lake
    format'): lineitem is round-tripped through an ORC layout and
    aggregated from the ORC scan — same vectorized-reader /
    predicate-pushdown machinery as parquet, verified by oracling the
    aggregate against the ORIGINAL parquet table (identical rows by
    construction, exact integer cents so the sum is order-free)."""
    path = _orc_copy(spark, sf_dir)
    df = spark.read.orc(path)
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("revenue_cents"),
    )


def _csv_copy(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a 3-column lineitem projection as headered CSV (once
    per sf_dir; _SUCCESS marker makes re-use cheap across sessions) so
    the text-format ingest path is exercised against real data."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/processor_spark_csv/{tag}/lineitem"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load(spark, sf_dir, "lineitem")
            .select(
                "l_orderkey",
                "l_returnflag",
                # ship cents as an integer COLUMN: CSV is text, and a
                # double printed/reparsed is the classic silent-drift
                # channel — integer cents round-trip exactly
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
                .cast("long")
                .alias("price_cents"),
            )
            .write.mode("overwrite")
            .option("header", "true")
            .csv(path)
        )
    return path


@register(
    "q_scan_csv",
    sql="""
    SELECT l_returnflag, count(*) AS n_rows,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           CAST(min(l_orderkey) AS BIGINT) AS min_order,
           CAST(max(l_orderkey) AS BIGINT) AS max_order
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingest path (SURVEY.md §2.1's text-format source — the
    format every landing zone still receives): lineitem round-trips
    through a headered CSV layout with an EXPLICIT schema (schema
    inference is a dev-only convenience; production text ingest always
    declares types) and is aggregated from the text scan.  Values ride
    as integer cents because a double printed to text and re-parsed is
    the classic silent-drift channel — the oracle replays the same
    aggregate from the original parquet, so the text round-trip is
    value-verified bit-free."""
    path = _csv_copy(spark, sf_dir)
    df = spark.read.schema(
        "l_orderkey BIGINT, l_returnflag STRING, price_cents BIGINT"
    ).option("header", "true").csv(path)
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("price_cents").alias("revenue_cents"),
        F.min("l_orderkey").alias("min_order"),
        F.max("l_orderkey").alias("max_order"),
    )


def _json_copy(spark: SparkSession, sf_dir: str) -> str:
    """Materialize orders as JSONL with a NESTED customer struct (once
    per sf_dir; _SUCCESS marker makes re-use cheap across sessions) so
    the semi-structured ingest path — including nested-field
    projection — is exercised against real data."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/processor_spark_json/{tag}/orders"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load(spark, sf_dir, "orders")
            .select(
                "o_orderkey",
                F.struct(
                    F.col("o_custkey").alias("key"),
                    F.col("o_orderstatus").alias("status"),
                ).alias("customer"),
                # integer cents: a double printed to text and re-parsed
                # is the classic silent-drift channel
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                .cast("long")
                .alias("price_cents"),
            )
            .write.mode("overwrite")
            .json(path)
        )
    return path


@register(
    "q_scan_json",
    sql="""
    SELECT o_orderstatus, count(*) AS n_rows,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingest path (SURVEY.md §2.1's semi-structured source —
    event buses and API exports land this shape): orders round-trip
    through line-delimited JSON with a NESTED struct column and an
    EXPLICIT schema (inference is dev-only; production declares types,
    which also lets the reader skip unreferenced keys), then aggregate
    from the text scan with a nested-field projection
    (customer.status / customer.key).  Values ride as integer cents;
    the oracle replays the same aggregate from the original parquet,
    so the JSON round-trip is value-verified drift-free."""
    path = _json_copy(spark, sf_dir)
    df = (
        spark.read.schema(
            "o_orderkey BIGINT, customer STRUCT<key: BIGINT, status: STRING>,"
            " price_cents BIGINT"
        ).json(path)
    )
    return df.groupBy(F.col("customer.status").alias("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("price_cents").alias("revenue_cents"),
        F.countDistinct(F.col("customer.key")).alias("n_custs"),
    )


def _evolved_copy(spark: SparkSession, sf_dir: str) -> str:
    """Two-generation parquet layout (once per sf_dir): generation 1
    lacks the o_orderpriority column, generation 2 carries it — the
    schema-evolution shape every long-lived lake table has."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/processor_spark_evolve/{tag}/orders"
    if not os.path.exists(os.path.join(path, "gen2", "_SUCCESS")):
        o = load(spark, sf_dir, "orders")
        cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        (
            o.where(F.col("o_orderdate") < "1998-01-01")
            .select("o_orderkey", cents.alias("price_cents"))
            .write.mode("overwrite")
            .parquet(f"{path}/gen1")
        )
        (
            o.where(F.col("o_orderdate") >= "1998-01-01")
            .select("o_orderkey", cents.alias("price_cents"), "o_orderpriority")
            .write.mode("overwrite")
            .parquet(f"{path}/gen2")
        )
    return path


@register(
    "q_schema_evolution",
    sql="""
    SELECT CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
                THEN o_orderpriority ELSE 'LEGACY' END AS priority,
           count(*) AS n_rows,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    GROUP BY priority
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read (SURVEY.md §1.3): the table's first
    generation predates the o_orderpriority column; mergeSchema unions
    the two file schemas and back-fills the missing column with NULL,
    which the query maps to a 'LEGACY' bucket.  This is the append-only
    lake reality — columns arrive mid-life and historical files are
    never rewritten — and the oracle replays the null-vs-present split
    from the original table, so both the merge AND the back-fill
    semantics are value-verified.

    Scale shape: schema merge is a footer-only planning step (file
    listing + two footers here; at 100 TB set the merged schema
    explicitly or via the metastore — mergeSchema footer-samples every
    file); the query itself is one pruned-scan hash agg."""
    path = _evolved_copy(spark, sf_dir)
    df = spark.read.option("mergeSchema", "true").parquet(f"{path}/gen1", f"{path}/gen2")
    return df.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("LEGACY")).alias("priority")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("price_cents").alias("revenue_cents"),
    )


def _csv_bad_copy(spark: SparkSession, sf_dir: str) -> str:
    """Headered CSV with DETERMINISTICALLY planted malformed rows
    (every 13th line ships a non-numeric price) — the landing-zone
    reality the clean _csv_copy fixture skips."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/processor_spark_csv_bad/{tag}/lineitem"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        li = load(spark, sf_dir, "lineitem")
        cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        bad = (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 13 == 0
        (
            li.select(
                "l_orderkey",
                "l_linenumber",
                "l_returnflag",
                F.when(bad, F.lit("corrupt")).otherwise(cents.cast("string")).alias(
                    "price_cents"
                ),
            )
            .write.mode("overwrite")
            .option("header", "true")
            .csv(path)
        )
    return path


@register(
    "q_scan_csv_malformed",
    sql="""
    SELECT l_returnflag,
           CAST(count_if((l_orderkey * 7 + l_linenumber) % 13 <> 0) AS BIGINT)
             AS n_good,
           CAST(count_if((l_orderkey * 7 + l_linenumber) % 13 = 0) AS BIGINT)
             AS n_corrupt,
           CAST(sum(CASE WHEN (l_orderkey * 7 + l_linenumber) % 13 <> 0
                         THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS good_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record handling on text ingest — PERMISSIVE mode with
    a corrupt-record column: every 13th planted bad row must land in
    _corrupt (typed columns NULL), every clean row must parse, and the
    good-row aggregate must equal the oracle's replay of the planting
    rule against the original parquet.  This is the quarantine
    split every landing zone needs (count the rejects, don't abort the
    job, don't silently coerce) — DROPMALFORMED/FAILFAST are the same
    reader one option away.

    Scale shape: parse + quarantine classification happen inside the
    scan stage (no extra pass); the aggregate is the usual two-phase
    hash agg."""
    path = _csv_bad_copy(spark, sf_dir)
    df = (
        spark.read.schema(
            "l_orderkey BIGINT, l_linenumber BIGINT, l_returnflag STRING,"
            " price_cents BIGINT, _corrupt STRING"
        )
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    return df.groupBy("l_returnflag").agg(
        F.count_if(F.col("_corrupt").isNull()).alias("n_good"),
        F.count_if(F.col("_corrupt").isNotNull()).alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt").isNull(), F.col("price_cents")).otherwise(0))
        .cast("long")
        .alias("good_cents"),
    )
