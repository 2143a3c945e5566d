"""Event-time / temporal operators — batch twins (SURVEY.md §2.9, §2.3).

These are the batch-mode twins of the streaming operators; Structured
Streaming's correctness story (SIGMOD'18, PAPERS.md:5) is exactly that
the same logical transformation gives the same answer incrementally.
processor_spark.streaming wires the readStream variants; the oracle
checks run against these batch builders.

Scale notes:
- tumbling/sliding windows are plain hash aggregations on a derived
  bucket key — fully parallel, map-side combinable.
- sessionization & as-of are one-shuffle window-function plans
  partitioned by user_id (high cardinality → no hot partitions; AQE
  skew-split covers power-law users).
- the interval join is expressed as coarse-bucket equi-join + residual
  predicate, never a nested loop (SURVEY.md §4 table, last rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from processor_spark.registry import register
from processor_spark.sources import load

SESSION_GAP_MIN = 30


@register(
    "q_tumbling_window",
    sql="""
    SELECT date_trunc('hour', ts) AS bucket_start, event_type,
           count(*) AS n_events, round(sum(value), 3) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling event-time window per event type.

    Uses F.window (the streaming-compatible form) and projects
    window.start so the schema matches the date_trunc oracle.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_sliding_window",
    sql="""
    WITH slid AS (
      -- naive timestamp arithmetic only: to_timestamp() would return
      -- TIMESTAMPTZ, whose rendering depends on the harness timezone
      SELECT TIMESTAMP '1970-01-01 00:00:00'
               + CAST(floor(epoch(ts) / 900) * 900 - k.k * 900 AS BIGINT) * INTERVAL 1 SECOND
               AS window_start,
             event_type, value
      FROM events
      CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    )
    SELECT window_start, event_type,
           count(*) AS n_events, round(sum(value), 3) AS total_value
    FROM slid
    GROUP BY 1, 2
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 min (each event lands in 4 windows).

    Spark's F.window(slide) does the 4-way replication internally; the
    oracle replicates explicitly via unnest([0..3]).
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SESSION_SQL = f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL {SESSION_GAP_MIN} MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), numbered AS (
      SELECT user_id, ts, event_id, value,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, round(sum(value), 3) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
"""


@register("q_sessionization", sql=_SESSION_SQL)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessions per user via gap-and-islands window functions.

    New session when the gap to the previous event is >= 30 min —
    matching F.session_window's exclusive window-end semantics, so the
    session_window variant (q_session_window) agrees exactly.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap >= SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("is_new").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 3).alias("session_value"),
    )


@register(
    "q_session_window",
    sql=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL {SESSION_GAP_MIN} MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), numbered AS (
      SELECT user_id, ts, event_id, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native F.session_window (the streaming-capable session operator).

    session_window end = last event + gap (exclusive); the oracle's
    gap-and-islands twin adds the gap to max(ts) to match.  Agreement
    of this key with q_sessionization is the batch↔stream-operator
    equivalence proof for sessions.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "q_join_asof",
    sql="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, 0 AS kind, ts AS click_ts, NULL::BIGINT AS purchase_id,
             NULL::DOUBLE AS purchase_value
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, event_id, 1 AS kind, NULL AS click_ts, event_id AS purchase_id,
             value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    ), carried AS (
      SELECT user_id, ts, purchase_id, purchase_value,
             max(click_ts) OVER (
               PARTITION BY user_id ORDER BY ts, kind, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
      FROM tagged
    )
    SELECT purchase_id, user_id, ts AS purchase_ts, last_click_ts,
           round(purchase_value, 3) AS purchase_value
    FROM carried
    WHERE purchase_id IS NOT NULL
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click of the same user
    at-or-before the purchase time.

    PySpark has no native as-of join; the scalable pattern is the
    union-and-carry trick: tag both sides, union, and carry the last
    click timestamp forward with a running max over (user_id, time).
    ONE shuffle on user_id, no candidate-pair explosion — unlike the
    naive inequality join whose intermediate is O(clicks × purchases)
    per user.  Ties (click.ts == purchase.ts) sort the click first
    (kind 0 < 1) so "at-or-before" includes them; event_id breaks any
    remaining tie deterministically (SURVEY.md §7 watch list).
    """
    e = load(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("kind"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("bigint").alias("purchase_id"),
        F.lit(None).cast("double").alias("purchase_value"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = clicks.unionByName(purchases).withColumn(
        "last_click_ts", F.max("click_ts").over(w)
    )
    return carried.where(F.col("purchase_id").isNotNull()).select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_click_ts",
        F.round("purchase_value", 3).alias("purchase_value"),
    )


@register(
    "q_join_interval",
    sql="""
    SELECT p.event_id AS purchase_id,
           count(e.event_id) AS n_errors_next_hour
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND e.ts >= p.ts
     AND e.ts < p.ts + INTERVAL 1 HOUR
    GROUP BY p.event_id
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: errors within 1 hour after each purchase (same user).

    Expressed as equi-join on user_id + time-range residual.  At 100 TB
    the additional trick (documented, not needed at fixture scale where
    user_id already bounds candidates) is to add a coarse time-bucket
    equi key on both sides — join on (user_id, bucket) with the probe
    replicated into the 2 buckets its 1-hour window can span — keeping
    the per-key candidate set O(events per user-hour) instead of
    O(events per user).
    """
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    errors = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    joined = purchases.join(
        errors,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts"))
        & (F.col("e_ts") < F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy("purchase_id").agg(
        F.count("err_id").alias("n_errors_next_hour")
    )


@register(
    "q_stream_enrich",
    sql="""
    SELECT e.event_id, e.event_type, round(e.value, 3) AS value,
           c.c_mktsegment AS segment, c.c_nationkey AS nationkey
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join, batch twin (SURVEY.md §2.9).

    events.user_id aligns with customer.c_custkey in the fixtures; the
    dim side is broadcast — the exact shape the streaming variant
    (streaming/pipelines.py::enrich_with_static) runs per micro-batch,
    where the broadcast is shipped once and reused.
    """
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .select(
            "event_id",
            "event_type",
            F.round("value", 3).alias("value"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nationkey"),
        )
    )


@register(
    "q_join_asof_tolerance",
    sql="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, 0 AS kind, ts AS err_ts,
             NULL::BIGINT AS purchase_id
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT user_id, ts, event_id, 1 AS kind, NULL AS err_ts,
             event_id AS purchase_id
      FROM events WHERE event_type = 'purchase'
    ), carried AS (
      SELECT user_id, ts, purchase_id,
             min(err_ts) OVER (
               PARTITION BY user_id ORDER BY ts DESC, kind, event_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_err_ts
      FROM tagged
    )
    SELECT purchase_id, user_id, ts AS purchase_ts,
           CASE WHEN next_err_ts <= ts + INTERVAL 30 MINUTE
                THEN next_err_ts END AS error_ts
    FROM carried
    WHERE purchase_id IS NOT NULL
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: for each purchase, the FIRST
    error of the same user at-or-after the purchase, but only within
    30 minutes (else NULL) — pandas merge_asof(direction='forward',
    tolerance=...) semantics.

    Same union-and-carry scalability story as q_join_asof (one shuffle
    on user_id, zero pair explosion), but scanning time DESCENDING and
    carrying a running MIN of error timestamps: every error already
    seen in a descending scan is >= the current row's ts, so the min
    of them is exactly the next-at-or-after error. The tolerance is a
    post-filter, not a join predicate, so the plan shape is unchanged.
    Ties (error.ts == purchase.ts) sort the error first (kind 0 < 1)
    so "at-or-after" includes them.
    """
    e = load(spark, sf_dir, "events")
    errors = e.where(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("kind"),
        F.col("ts").alias("err_ts"),
        F.lit(None).cast("bigint").alias("purchase_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("err_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.asc("kind"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = errors.unionByName(purchases).select(
        "user_id",
        "ts",
        "purchase_id",
        F.min("err_ts").over(w).alias("next_err_ts"),
    )
    return carried.where(F.col("purchase_id").isNotNull()).select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(
            F.col("next_err_ts") <= F.col("ts") + F.expr("INTERVAL 30 MINUTES"),
            F.col("next_err_ts"),
        ).alias("error_ts"),
    )


@register(
    "q_late_arrivals",
    sql="""
    WITH arrivals AS (
      SELECT event_type, ts,
             max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS frontier
      FROM events
    )
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN ts < frontier - INTERVAL 10 MINUTE THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           CAST(sum(CASE WHEN ts < frontier - INTERVAL 60 MINUTE THEN 1 ELSE 0 END) AS BIGINT)
             AS n_very_late
    FROM arrivals
    GROUP BY event_type
    """,
)
def q_late_arrivals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data audit — the batch mirror of the streaming watermark
    decision: replay events in ARRIVAL order (event_id) and count how
    many arrive with an event time more than 10/60 minutes behind the
    already-seen maximum for their type.  This is exactly the row set a
    10-minute (resp. 1-hour) watermark would drop, so it is the
    measurement you run BEFORE choosing a watermark delay.

    One running-max window per type (single shuffle), then a
    conditional agg.  The frontier excludes the current row (1
    PRECEDING) so an event is compared against strictly earlier
    arrivals on both engines.
    """
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arrivals = e.select(
        "event_type", "ts", F.max("ts").over(w).alias("frontier")
    )
    late = F.col("ts") < F.col("frontier") - F.expr("INTERVAL 10 MINUTES")
    very_late = F.col("ts") < F.col("frontier") - F.expr("INTERVAL 60 MINUTES")
    return arrivals.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(late, 1).otherwise(0)).alias("n_late"),
        F.sum(F.when(very_late, 1).otherwise(0)).alias("n_very_late"),
    )


@register(
    "q_pattern_negation",
    sql="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, 0 AS kind, ts AS click_ts, NULL::TIMESTAMP AS err_ts,
             NULL::BIGINT AS purchase_id
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, event_id, 1 AS kind, NULL AS click_ts, ts AS err_ts,
             NULL AS purchase_id
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT user_id, ts, event_id, 2 AS kind, NULL AS click_ts, NULL AS err_ts,
             event_id AS purchase_id
      FROM events WHERE event_type = 'purchase'
    ), carried AS (
      SELECT user_id, ts, purchase_id,
             max(click_ts) OVER w AS last_click_ts,
             max(err_ts)   OVER w AS last_err_ts
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, kind, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT purchase_id, user_id, ts AS purchase_ts, last_click_ts
    FROM carried
    WHERE purchase_id IS NOT NULL
      AND last_click_ts IS NOT NULL
      AND last_click_ts >= ts - INTERVAL 1 HOUR
      AND (last_err_ts IS NULL OR last_err_ts <= last_click_ts)
    """,
)
def q_pattern_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP negation pattern: purchases preceded by a click within one
    hour with NO error event in between (click → purchase, ¬error) —
    the sequence-with-absence match every funnel/alerting engine needs,
    where the ABSENCE is the hard part (a join can prove presence;
    proving a gap needs ordered state).

    Same scalable shape as q_join_asof: tag clicks/errors/purchases,
    union, carry running max click-ts and error-ts per user in ONE
    window pass — an error "between" exists iff the carried error ts
    exceeds the carried click ts at the purchase row.  One shuffle on
    user_id, zero joins, no pair space.  Kind order (click 0, error 1,
    purchase 2) fixes same-timestamp semantics deterministically: an
    error at the click's exact ts does not disqualify, one at the
    purchase's exact ts does.
    """
    e = load(spark, sf_dir, "events")
    base = ["user_id", "ts", "event_id"]
    clicks = e.where(F.col("event_type") == "click").select(
        *base,
        F.lit(0).alias("kind"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("timestamp").alias("err_ts"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    errors = e.where(F.col("event_type") == "error").select(
        *base,
        F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("ts").alias("err_ts"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        *base,
        F.lit(2).alias("kind"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(None).cast("timestamp").alias("err_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        clicks.unionByName(errors)
        .unionByName(purchases)
        .select(
            "user_id",
            "ts",
            "purchase_id",
            F.max("click_ts").over(w).alias("last_click_ts"),
            F.max("err_ts").over(w).alias("last_err_ts"),
        )
    )
    return (
        carried.where(
            F.col("purchase_id").isNotNull()
            & F.col("last_click_ts").isNotNull()
            & (F.col("last_click_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("last_err_ts").isNull() | (F.col("last_err_ts") <= F.col("last_click_ts")))
        )
        .select("purchase_id", "user_id", F.col("ts").alias("purchase_ts"), "last_click_ts")
    )


@register(
    "q_join_asof_forward",
    sql="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, 0 AS kind, event_id AS purchase_id,
             NULL::TIMESTAMP AS click_ts
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, event_id, 1 AS kind, NULL AS purchase_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), carried AS (
      SELECT user_id, ts, purchase_id,
             min(click_ts) OVER (
               PARTITION BY user_id ORDER BY ts, kind, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_click_ts
      FROM tagged
    )
    SELECT purchase_id, user_id, ts AS purchase_ts, next_click_ts,
           COALESCE(CAST(epoch_us(next_click_ts) - epoch_us(ts) AS BIGINT), -1)
             AS time_to_next_us
    FROM carried
    WHERE purchase_id IS NOT NULL
    """,
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — q_join_asof's mirror direction: for each
    purchase, the EARLIEST click at-or-after it, plus the time-to-next
    latency in exact microseconds (-1 when no later click exists).
    "What did the user do next?" is the other half of the as-of API
    (pandas merge_asof direction='forward'); same union-and-carry
    shape with the running max swapped for a running min over a
    FOLLOWING frame.  At equal timestamps the purchase (kind 0) sorts
    before the click (kind 1), so same-instant clicks count as
    "after" — symmetric with the backward key's inclusive tie rule.

    Scale shape: identical to q_join_asof — ONE shuffle on user_id,
    no inequality-join pair explosion."""
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("bigint").alias("purchase_id"),
        F.col("ts").alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = purchases.unionByName(clicks).withColumn(
        "next_click_ts", F.min("click_ts").over(w)
    )
    return carried.where(F.col("purchase_id").isNotNull()).select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "next_click_ts",
        F.coalesce(
            F.unix_micros("next_click_ts") - F.unix_micros("ts"), F.lit(-1)
        ).alias("time_to_next_us"),
    )


@register(
    "q_session_dynamic_gap",
    sql="""
    WITH pts AS (
      SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t, event_id,
             CASE event_type WHEN 'click' THEN 300000000
                             WHEN 'view' THEN 600000000
                             WHEN 'purchase' THEN 1800000000
                             ELSE 900000000 END AS gap_us,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events
    ), flagged AS (
      SELECT user_id, t, gap_us, cents, event_id,
             CASE WHEN t >= COALESCE(max(t + gap_us) OVER (
                    PARTITION BY user_id ORDER BY t, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -9223372036854775807)
                  THEN 1 ELSE 0 END AS is_new
      FROM pts
    ), numbered AS (
      SELECT user_id, t, gap_us, cents,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS sid
      FROM flagged
    )
    SELECT user_id,
           CAST(min(t) AS BIGINT) AS start_us,
           CAST(max(t + gap_us) AS BIGINT) AS end_us,
           count(*) AS n_events,
           CAST(sum(cents) AS BIGINT) AS session_cents
    FROM numbered GROUP BY user_id, sid
    """,
)
def q_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap sessionization — the native F.session_window with a
    PER-EVENT timeout (a purchase holds a session open 30 min, a click
    only 5): the behavioral reality fixed-gap sessions flatten.  The
    oracle replays Spark's interval-merge semantics from first
    principles — an event starts a new session iff its time is at or
    past the running max of every earlier event's (time + its own
    gap), i.e. windows merge while they overlap and the merged end is
    the max end — so this key VALIDATES the native operator's merge
    rule against an independent formulation, exactly like
    q_session_window does for the fixed-gap case.  Exact microsecond
    integers and integer cents end-to-end.

    Scale shape: one shuffle on user_id (native operator and oracle
    alike); the same code streams with a watermark (pipelines.py's
    session twin), which is the point of using session_window rather
    than the islands idiom when the pipeline must run both modes."""
    e = load(spark, sf_dir, "events")
    gap_col = (
        F.when(F.col("event_type") == "click", F.lit("5 minutes"))
        .when(F.col("event_type") == "view", F.lit("10 minutes"))
        .when(F.col("event_type") == "purchase", F.lit("30 minutes"))
        .otherwise(F.lit("15 minutes"))
    )
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    return (
        e.groupBy(F.session_window("ts", gap_col).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("session_cents"),
        )
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("start_us"),
            F.unix_micros("sw.end").alias("end_us"),
            "n_events",
            "session_cents",
        )
    )


@register(
    "q_top_paths",
    sql=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id, event_type,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM flagged
    ), paths AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM numbered GROUP BY user_id, sid
    )
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 10
    """,
)
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey paths — "which exact event sequences happen
    most?": events sessionize with the same 30-min islands as
    q_sessionization, each session serializes its ordered event types
    into a '>'-joined path string, and the 10 most frequent paths win
    (count DESC, path ASC — a total order).  Order inside a path is
    pinned by (ts, event_id) on both engines: Spark sorts an array of
    (ts, event_id, type) structs (lexicographic struct order = the
    window's order) and projects the types, mirroring the oracle's
    ordered string_agg.

    Scale shape: one shuffle on user_id for the islands window, one
    hash agg to paths (collect_list is bounded by session length —
    human-scale, not data-scale), one TakeOrdered over the path
    counts.  The path-frequency agg is map-side combinable on the
    path string."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap >= SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "sid",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    paths = numbered.groupBy("user_id", "sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(10)
    )


# --------------------------------------------------------- asof nearest


@register(
    "q_join_asof_nearest",
    sql="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, 0 AS kind, ts AS click_ts,
             NULL::BIGINT AS purchase_id
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, event_id, 1 AS kind, NULL AS click_ts,
             event_id AS purchase_id
      FROM events WHERE event_type = 'purchase'
    ), carried AS (
      SELECT user_id, ts, purchase_id,
             max(click_ts) OVER (
               PARTITION BY user_id ORDER BY ts, kind, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_ts,
             min(click_ts) OVER (
               PARTITION BY user_id ORDER BY ts, kind, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_ts
      FROM tagged
    ), chosen AS (
      SELECT purchase_id, user_id, ts,
             epoch_us(ts) - epoch_us(back_ts) AS back_gap_us,
             epoch_us(fwd_ts) - epoch_us(ts) AS fwd_gap_us
      FROM carried WHERE purchase_id IS NOT NULL
    )
    SELECT purchase_id, user_id, ts AS purchase_ts,
           CASE WHEN back_gap_us IS NULL AND fwd_gap_us IS NULL THEN 'none'
                WHEN fwd_gap_us IS NULL THEN 'back'
                WHEN back_gap_us IS NULL THEN 'fwd'
                WHEN back_gap_us <= fwd_gap_us THEN 'back' ELSE 'fwd' END AS direction,
           CAST(CASE WHEN back_gap_us IS NULL AND fwd_gap_us IS NULL THEN -1
                WHEN fwd_gap_us IS NULL THEN back_gap_us
                WHEN back_gap_us IS NULL THEN fwd_gap_us
                WHEN back_gap_us <= fwd_gap_us THEN back_gap_us
                ELSE fwd_gap_us END AS BIGINT) AS gap_us
    FROM chosen
    ORDER BY purchase_id
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of join: for each purchase, the CLOSEST
    click of the same user in either time direction (tie -> backward)
    — the sensor-alignment variant of as-of (pair each reading with
    the nearest reference sample, not merely the last one).

    Same union-and-carry shape as q_join_asof (temporal.py) run BOTH
    ways in one pass: a running max of click times over the preceding
    frame and a running min over the following frame, then an exact
    integer-microsecond gap comparison — one shuffle on user_id, two
    window passes over the same sort, no inequality-join explosion.
    A same-timestamp click sorts before the purchase (kind 0 < 1), so
    it is the backward candidate with gap 0 and wins every tie."""
    e = load(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("kind"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("bigint").alias("purchase_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    order = [F.col("ts"), F.col("kind"), F.col("event_id")]
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = (
        clicks.unionByName(purchases)
        .withColumn("back_ts", F.max("click_ts").over(w_back))
        .withColumn("fwd_ts", F.min("click_ts").over(w_fwd))
    )
    chosen = carried.where(F.col("purchase_id").isNotNull()).select(
        "purchase_id",
        "user_id",
        "ts",
        (F.unix_micros("ts") - F.unix_micros("back_ts")).alias("back_gap_us"),
        (F.unix_micros("fwd_ts") - F.unix_micros("ts")).alias("fwd_gap_us"),
    )
    both_null = F.col("back_gap_us").isNull() & F.col("fwd_gap_us").isNull()
    back_wins = F.col("back_gap_us") <= F.col("fwd_gap_us")
    return chosen.select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(both_null, F.lit("none"))
        .when(F.col("fwd_gap_us").isNull(), F.lit("back"))
        .when(F.col("back_gap_us").isNull(), F.lit("fwd"))
        .when(back_wins, F.lit("back"))
        .otherwise(F.lit("fwd"))
        .alias("direction"),
        F.when(both_null, F.lit(-1))
        .when(F.col("fwd_gap_us").isNull(), F.col("back_gap_us"))
        .when(F.col("back_gap_us").isNull(), F.col("fwd_gap_us"))
        .when(back_wins, F.col("back_gap_us"))
        .otherwise(F.col("fwd_gap_us"))
        .cast("long")
        .alias("gap_us"),
    ).orderBy("purchase_id")


# ------------------------------------------------------------ trending


@register(
    "q_trending_topk",
    sql="""
    WITH slid AS (
      SELECT TIMESTAMP '1970-01-01 00:00:00'
               + CAST(floor(epoch(ts) / 3600) * 3600 - k.k * 3600 AS BIGINT)
                 * INTERVAL 1 SECOND AS window_start,
             event_type
      FROM events
      CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5]) AS k) k
    ), counted AS (
      SELECT window_start, event_type, count(*) AS n_events
      FROM slid GROUP BY 1, 2
    )
    SELECT window_start, event_type, CAST(n_events AS BIGINT) AS n_events,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT window_start, event_type, n_events,
             row_number() OVER (PARTITION BY window_start
                                ORDER BY n_events DESC, event_type) AS rnk
      FROM counted
    ) WHERE rnk <= 3
    ORDER BY window_start, rnk
    """,
)
def q_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending leaderboard: the top-3 event types per 6-hour window
    sliding hourly — the realtime-dashboard query (what's hot right
    now, updated every hour with six hours of context).

    Spark's F.window(slide) replicates each event into its 6 windows
    internally; the oracle replicates explicitly via unnest([0..5])
    with naive timestamp arithmetic (to_timestamp would emit
    TIMESTAMPTZ — the harness-timezone trap).  Ranking ties break on
    event_type for a total order.

    Scale shape: the slide replication feeds a map-side-combinable
    (window, type) hash agg — the ranking window then runs on the
    bounded (windows x types) cell table, never the event stream."""
    e = load(spark, sf_dir, "events")
    counted = e.groupBy(
        F.window("ts", "6 hours", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("w").orderBy(F.desc("n_events"), F.asc("event_type"))
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("rnk").cast("long").alias("rnk"),
        )
        .orderBy("window_start", "rnk")
    )
