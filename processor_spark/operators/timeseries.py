"""Time-series completions: gap filling and funnel analysis.

Two event-analytics staples beyond plain windowed aggs — both pure
relational compositions (SURVEY.md §2.9 family):

- q_gap_fill: dense hourly series per event type with zero-filled
  gaps — the "resample" primitive behind dashboards and hypertable
  rollups.  The hour spine is generated with F.sequence + explode
  (rows = hours × types, tiny relative to events) and the events agg
  is left-joined onto it; at 100 TB the spine stays negligible while
  the agg side is the usual two-phase hash agg.
- q_funnel: staged conversion (click → signup → purchase, each stage
  at-or-after the previous) per user, reduced to stage counts.  Three
  conditional aggs chained on user_id; all three shuffles share the
  same key so AQE/bucketing co-locates them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_spark.registry import register
from processor_spark.sources import load


@register(
    "q_gap_fill",
    sql="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ), hours AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_start FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), actual AS (
      SELECT date_trunc('hour', ts) AS bucket_start, event_type,
             count(*) AS n, round(sum(value), 3) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT h.bucket_start, t.event_type,
           coalesce(a.n, 0) AS n_events,
           coalesce(a.v, 0.0) AS total_value
    FROM hours h
    CROSS JOIN types t
    LEFT JOIN actual a
      ON a.bucket_start = h.bucket_start AND a.event_type = t.event_type
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type; missing hours zero-filled."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket_start")
    )
    types = e.select("event_type").distinct()
    actual = (
        e.groupBy(F.date_trunc("hour", "ts").alias("bucket_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 3).alias("v"))
    )
    spine = hours.crossJoin(F.broadcast(types))
    return (
        spine.join(actual, ["bucket_start", "event_type"], "left")
        .select(
            "bucket_start",
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("v", F.lit(0.0)).alias("total_value"),
        )
    )


@register(
    "q_funnel",
    sql="""
    WITH c AS (
      SELECT user_id, min(ts) AS t_click FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ), s AS (
      SELECT e.user_id, min(e.ts) AS t_signup
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'signup' AND e.ts >= c.t_click
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.t_signup
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM c) AS users_clicked,
           (SELECT count(*) FROM s) AS users_signed_up,
           (SELECT count(*) FROM p) AS users_purchased
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-stage funnel: users whose first click precedes a signup which
    precedes a purchase (each stage at-or-after the previous one)."""
    e = load(spark, sf_dir, "events")
    c = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s = (
        e.where(F.col("event_type") == "signup")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        c.agg(F.count(F.lit(1)).alias("users_clicked"))
        .crossJoin(s.agg(F.count(F.lit(1)).alias("users_signed_up")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("users_purchased")))
    )


@register(
    "q_anomaly_zscore",
    sql="""
    SELECT event_id, event_type, round(value, 3) AS value, round(z, 4) AS z
    FROM (
      SELECT event_id, event_type, value,
             (value - avg(value) OVER (PARTITION BY event_type))
               / NULLIF(stddev(value) OVER (PARTITION BY event_type), 0) AS z
      FROM events
    )
    WHERE abs(z) > 3.0
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection: events whose value is >3 sample
    standard deviations from their type's mean.  One unordered window
    per event_type (a single shuffle on the partition key; at scale the
    per-type stats could instead be a broadcast-back groupBy so the
    fact table is scanned once and never sorted)."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    z = (F.col("value") - F.avg("value").over(w)) / F.nullif(
        F.stddev("value").over(w), F.lit(0.0)
    )
    return (
        e.withColumn("z", z)
        .where(F.abs(F.col("z")) > 3.0)
        .select(
            "event_id",
            "event_type",
            F.round("value", 3).alias("value"),
            F.round("z", 4).alias("z"),
        )
    )


@register(
    "q_cohort_retention",
    sql="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week FROM events GROUP BY user_id
    )
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) / 7 AS INTEGER) AS week_n,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY f.cohort_week, week_n
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    distinct in each subsequent week.  first-seen is a groupBy (not a
    window) so the fact scan shuffles once on user_id and the cohort
    map joins back by key; Monday week-truncation agrees across engines
    and the DATE is stringified (CLAUDE.md bridge)."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    return (
        e.join(firsts, "user_id")
        .withColumn(
            "week_n",
            (F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7).cast("int"),
        )
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"), "week_n"
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "q_transition_matrix",
    sql="""
    SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY event_type), 4) AS p
    FROM (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    )
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: P(next event type | current).  One shuffle on user_id for
    the lead window, then a tiny (types × types) agg; the row-normalize
    window runs on that tiny result, not the fact table."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        e.withColumn("next_type", F.lead("event_type").over(seq))
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(norm), 4).alias("p"),
    )


@register(
    "q_event_throttle",
    sql="""
    SELECT event_id, user_id, event_type, ts
    FROM (
      SELECT event_id, user_id, event_type, ts,
             lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    WHERE prev_ts IS NULL OR date_diff('second', prev_ts, ts) >= 300
    """,
)
def q_event_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce/throttle: keep an event only if the previous event of
    the same (user, type) is at least 5 minutes older — the dedup
    variant real pipelines want when retries arrive with fresh ids
    (dropDuplicates can't catch them).  Single lag window per key;
    streaming twin is the same logic via applyInPandasWithState."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return (
        e.withColumn("prev_ts", prev)
        .where(
            F.col("prev_ts").isNull()
            | ((F.unix_micros("ts") - F.unix_micros("prev_ts")) >= 300 * 1_000_000)
        )
        .select("event_id", "user_id", "event_type", "ts")
    )
