"""Behavioral analytics: funnels, retention cohorts, skew-salted joins.

The event-stream query family a product-analytics user of the engine
runs daily. Each shape is chosen for its 100 TB form:

- the funnel is ONE aggregation over events (per-user min step
  timestamps), never a per-step self-join (k-step funnel as k-way join
  is O(events^k) pair formation and dies at scale);
- retention is two hash aggregations (first-seen, then cohort x offset),
  both partial-aggregatable map-side;
- the salted join materializes the standard hot-key remedy as a reusable
  operator: explode the small side S ways, salt the fact key with
  pmod(hash, S), join on (key, salt) — every hot key's rows now spread
  over S tasks instead of one straggler.

Same conventions as the rest of the surface: JVM-side expressions, every
computed column aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_compactor_spark.registry import load, register


@register(
    "q_funnel_steps",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END)     AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END)    AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT
        CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT) AS n_view,
        CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL
                                AND t_click > t_view) AS BIGINT)   AS n_click,
        CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL
                                AND t_click > t_view
                                AND t_purchase > t_click) AS BIGINT) AS n_purchase
    FROM firsts
    """,
    doc="Ordered 3-step funnel (view -> click -> purchase): per-user FIRST "
    "timestamp of each step via one conditional-MIN aggregation, then "
    "count users whose step times are strictly increasing. ONE shuffle on "
    "user_id + a global roll-up of 3 counters — never the k-way self-join "
    "formulation whose pair formation is O(events^k). Conditional MIN is "
    "partial-aggregatable, so map-side combine sees every executor's "
    "events once.",
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")

    def first_ts(step: str):
        return F.min(F.when(F.col("event_type") == step, F.col("ts")))

    firsts = e.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    stage1 = F.col("t_view").isNotNull()
    stage2 = stage1 & (F.col("t_click") > F.col("t_view"))
    stage3 = stage2 & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count(F.when(stage1, 1)).alias("n_view"),
        F.count(F.when(stage2, 1)).alias("n_click"),
        F.count(F.when(stage3, 1)).alias("n_purchase"),
    )


@register(
    "q_retention_cohorts",
    oracle="""
    WITH cohorts AS (
        SELECT user_id,
               DATE_TRUNC('week', CAST(MIN(ts) AS DATE)) AS cohort_week
        FROM events GROUP BY user_id
    )
    SELECT strftime(c.cohort_week, '%Y-%m-%d')            AS cohort_week,
           CAST(FLOOR(DATE_DIFF('day', c.cohort_week,
                      CAST(e.ts AS DATE)) / 7) AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT)      AS active_users
    FROM events e JOIN cohorts c USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Weekly retention cohorts: users bucketed by first-seen week, "
    "activity counted per (cohort, week-offset) cell. Two hash "
    "aggregations (per-user first-seen; then cohort x offset distinct "
    "users) joined on user_id — the cohort table is |users| rows, "
    "orders of magnitude under the fact table, and the distinct-count "
    "shuffle key (cohort, offset, user) is high-cardinality and "
    "uniform. No windows, no self-join on the fact table.",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cohorts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts").cast("date")).cast("date").alias(
            "cohort_week"
        )
    )
    return (
        e.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_week")) / 7
            ).alias("week_offset"),
        )
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


SALT_BUCKETS = 8


@register(
    "q_salted_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT)        AS n_events,
           ROUND(SUM(e.value), 2)          AS total_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_mktsegment
    """,
    doc="Skew-salted equi-join (join twin of q_salted_agg, via "
    "functions.skew.salted_join): the dim side is exploded SALT_BUCKETS "
    "ways, the fact key is salted with pmod(xxhash64(event_id), S), and "
    "the join runs on (key, salt) — a hot key's rows spread over S tasks "
    "instead of one straggler. The remedy for power-law keys when the "
    "build side is too large to broadcast and static enough that AQE's "
    "runtime skew split can't see the skew (e.g. bucketed tables). "
    "Salting is semantics-free: the oracle is the plain join.",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_compactor_spark.functions.skew import salted_join

    e = load(spark, sf_dir, "events").withColumnRenamed("user_id", "c_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        salted_join(e, c, on="c_custkey", buckets=SALT_BUCKETS, salt_source="event_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type, count(*) AS n,
           ROUND(CAST(count(*) AS DOUBLE)
                 / SUM(count(*)) OVER (PARTITION BY prev_type), 4) AS p
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: LAG per user gives (prev, next) bigrams, one hash-agg "
    "counts them, and a window over the |types|^2-row RESULT (25 rows "
    "here — never the fact table) normalizes each row to transition "
    "probabilities. The per-user window partitions on the uniform "
    "user_id key, so state per task is one user's events; the "
    "normalizing window runs on dimension-sized data. (user_id, ts) "
    "is unique in the fixture, with event_id as a deterministic "
    "tiebreak. Probabilities divide two exact counts -> 4dp rounding "
    "is engine-stable.",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    seq = e.withColumn(
        "prev_type",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_total = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(row_total), 4).alias("p"),
    )
