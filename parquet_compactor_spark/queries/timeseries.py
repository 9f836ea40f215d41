"""Time-series operators over events: rolling range-frame windows,
gap-filled bucket rollups, corpus vocabulary.

The hypertable-flavored members of the surface: continuous-time rollups
expressed as window frames and generated dimension spines, all
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_compactor_spark.registry import load, register


@register(
    "q_window_range_frame",
    oracle="""
    SELECT event_id,
           user_id,
           COUNT(*) OVER w              AS events_last_hour,
           ROUND(SUM(value) OVER w, 2)  AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="Rolling 1-hour window per user via a RANGE frame over event-time "
    "micros (value-based frame, not row-count): the continuous-rollup "
    "primitive. One shuffle on user_id; frame state is the in-window rows.",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("events_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("value_last_hour"),
    )


@register(
    "q_gapfill_buckets",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
        SELECT date_trunc('day', ts) AS day, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        FROM events GROUP BY 1, 2
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           t.event_type,
           COALESCE(a.n, 0)            AS n_events,
           COALESCE(a.total, 0.0)      AS total_value
    FROM spine s CROSS JOIN types t
    LEFT JOIN actual a ON a.day = s.day AND a.event_type = t.event_type
    """,
    doc="Gap-filled daily rollup: silent day×type combos appear as zeros "
    "(the time-series densification primitive) via UNION ALL, not an outer "
    "join. Spark's BroadcastHashJoin can only build on the NON-preserved "
    "side of an outer join, so 'spine LEFT JOIN actual' would have to "
    "broadcast the fact-derived aggregate in full. Instead: the aggregated "
    "rollup flows straight to the output untouched by any join, and the "
    "zero rows come from the provably-tiny generated spine×types "
    "anti-joined against just the observed KEY SET (two deduped columns — "
    "the minimal possible broadcast payload, strictly smaller than the "
    "rollup itself). At 100 TB the fact table is scanned and partially "
    "aggregated, and nothing fact-sized is ever broadcast or re-shuffled.",
)
def q_gapfill_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    types = e.select("event_type").distinct()
    actual = (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    missing = (
        spine.crossJoin(types)
        .join(F.broadcast(actual.select("day", "event_type")), ["day", "event_type"], "left_anti")
        .select(
            "day",
            "event_type",
            F.lit(0).cast("long").alias("n"),
            F.lit(0.0).alias("total"),
        )
    )
    return (
        actual.unionByName(missing)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.col("n").alias("n_events"),
            F.col("total").alias("total_value"),
        )
    )


@register(
    "q_locf_interpolate",
    oracle="""
    WITH sparse AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        FROM events
    )
    SELECT event_id,
           user_id,
           ROUND(COALESCE(v,
               LAST_VALUE(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0.0), 2) AS v_filled,
           (v IS NULL) AS was_gap
    FROM sparse
    """,
    doc="Last-observation-carried-forward gap filling (every 5th reading "
    "nulled to simulate sensor gaps, then filled from the previous non-null "
    "per user). The interpolation primitive for irregular time series: one "
    "shuffle on user_id, last(ignorenulls) over an ordered frame.",
)
def q_locf_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    sparse = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sparse.select(
        "event_id",
        "user_id",
        F.round(
            F.coalesce(
                F.col("v"), F.last("v", ignorenulls=True).over(w), F.lit(0.0)
            ),
            2,
        ).alias("v_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


@register(
    "q_zscore_outliers",
    oracle="""
    WITH scored AS (
        SELECT event_id, event_type, value,
               AVG(value)         OVER (PARTITION BY event_type) AS mu,
               STDDEV_SAMP(value) OVER (PARTITION BY event_type) AS sigma
        FROM events
    )
    SELECT event_id, event_type,
           ROUND(value, 2)                AS value,
           ROUND((value - mu) / sigma, 3) AS zscore
    FROM scored
    WHERE ABS((value - mu) / sigma) > 2
    """,
    doc="Anomaly detection: per-type z-score as a TWO-PASS plan — "
    "groupBy(event_type).agg(avg, stddev) collapses to one tiny row per "
    "type (partial agg map-side), then broadcast-joins back onto the fact "
    "scan. Unlike an unbounded analytic window over low-cardinality "
    "event_type (a handful of giant partitions that must fully "
    "materialize per task at 100 TB), this shape never shuffles the fact "
    "table at all: the only exchange is the partial-agg rollup, and the "
    "per-type stats ride back via broadcast.",
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("_mu"),
        F.stddev_samp("value").alias("_sigma"),
    )
    z = (F.col("value") - F.col("_mu")) / F.col("_sigma")
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(z, 3).alias("zscore"),
        )
    )


@register(
    "q_ewma",
    oracle="""
    WITH hist AS (
        -- value IS NOT NULL on BOTH sides: DuckDB's list() keeps NULLs
        -- while Spark's collect_list drops them, so a NULL-bearing
        -- fixture generation would silently misalign the frames.
        SELECT event_id, user_id, value,
               list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vals
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_id, user_id,
           ROUND(value, 2) AS value,
           -- floor-based 4dp rounding, NOT ROUND(): the fold result is
           -- bit-identical across engines (same IEEE op sequence), but
           -- Spark's round() rounds the double's SHORTEST DECIMAL REPR
           -- half-up while DuckDB rounds the binary value — a fold
           -- landing on x.xxxx5 splits (4.85345 -> 4.8535 vs 4.8534).
           -- floor(x*1e4 + 0.5)/1e4 is the same doubles math on both.
           FLOOR(list_reduce(vals, (acc, x) -> acc * 0.7 + x * 0.3)
                 * 10000 + 0.5) / 10000 AS ewma10
    FROM hist
    """,
    doc="Exponentially-weighted moving average (alpha=0.3) over the last 10 "
    "readings per user: ordered-frame collect_list + a sequential left fold "
    "(list_reduce seeds with the first element — the standard EWMA "
    "recursion). The recursion is not a distributive aggregate, so the "
    "bounded frame keeps state O(window) per row at any scale. EWMA is "
    "defined over OBSERVED readings: both engines scope to non-null "
    "values explicitly (collect_list drops NULLs, DuckDB list() keeps "
    "them — the frames would misalign on a NULL-bearing fixture).",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    vals = F.collect_list("value").over(w)
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1).cast("double"),
        lambda acc, x: acc * F.lit(0.7) + x * F.lit(0.3),
    )
    return e.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        # floor-form 4dp: bit-identical to the oracle (see oracle note).
        (F.floor(ewma * 10000 + F.lit(0.5)) / 10000).alias("ewma10"),
    )


@register(
    "q_top_bigrams",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    ),
    grams AS (
        SELECT tokens[n] || ' ' || tokens[n + 1] AS bigram
        FROM (SELECT tokens, unnest(range(1, len(tokens))) AS n FROM toks)
    )
    SELECT bigram, COUNT(*) AS n
    FROM grams
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
    doc="Corpus vocabulary: top-20 bigrams with counts — explode n-grams → "
    "hash count → heap top-k (TakeOrderedAndProject). The vocabulary-"
    "building primitive for tokenizer training.",
)
def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ", -1).alias("tokens"))
    grams = toks.select(
        F.explode(
            F.expr(
                """
                CASE WHEN size(tokens) >= 2
                THEN transform(sequence(1, size(tokens) - 1),
                               i -> concat(tokens[i - 1], ' ', tokens[i]))
                ELSE array() END
                """
            )
        ).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "q_running_distinct",
    oracle="""
    WITH firsts AS (
        SELECT event_id, user_id, ts,
               CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                            ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS is_first
        FROM events
    )
    SELECT event_id,
           user_id,
           CAST(SUM(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS distinct_types_so_far
    FROM firsts
    """,
    doc="Running COUNT(DISTINCT) per user without holding a distinct set: "
    "mark each (user, event_type)'s first occurrence, then running-sum "
    "the markers. BOTH windows partition by user_id only — the first "
    "detects type-run boundaries in (event_type, ts) order (the first "
    "row of each type run IS the type's first occurrence), so Spark "
    "satisfies the two different sort orders with two sorts over ONE "
    "exchange. State per row is O(1) — the naive collect_set-over-window "
    "form grows per-row state linearly and dies at scale.",
)
def q_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_first = F.when(
        F.lag("event_type").over(w_first).isNull()
        | (F.lag("event_type").over(w_first) != F.col("event_type")),
        1,
    ).otherwise(0)
    return e.select(
        "event_id",
        "user_id",
        is_first.alias("_f"),
        "ts",
    ).select(
        "event_id",
        "user_id",
        F.sum("_f").over(w_run).cast("bigint").alias("distinct_types_so_far"),
    )


@register(
    "q_rate_of_change",
    oracle="""
    WITH seq AS (
        SELECT event_id, user_id, ts, value,
               LAG(value) OVER w AS prev_value,
               LAG(ts)    OVER w AS prev_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id,
           user_id,
           ROUND((value - prev_value)
                 / ((epoch_us(ts) - epoch_us(prev_ts)) / 1000000.0), 6) + 0.0
               AS rate_per_sec
    FROM seq
    WHERE prev_ts IS NOT NULL AND epoch_us(ts) <> epoch_us(prev_ts)
    """,
    doc="First derivative of an irregular time series: per-user value delta "
    "over seconds delta between consecutive readings (the monitoring "
    "rate() primitive). One shuffle on user_id; zero-dt pairs excluded.",
)
def q_rate_of_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_v = F.lag("value").over(w)
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    dt_sec = (F.unix_micros("ts") - prev_us) / 1000000.0
    return (
        e.select(
            "event_id",
            "user_id",
            F.round((F.col("value") - prev_v) / dt_sec, 6).alias("rate_per_sec"),
            prev_us.alias("_prev_us"),
            F.unix_micros("ts").alias("_us"),
        )
        .filter(F.col("_prev_us").isNotNull() & (F.col("_us") != F.col("_prev_us")))
        .select("event_id", "user_id", "rate_per_sec")
    )


@register(
    "q_month_over_month",
    oracle="""
    WITH monthly AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY 1
    )
    SELECT month,
           revenue,
           ROUND((revenue - LAG(revenue) OVER (ORDER BY month))
                 / LAG(revenue) OVER (ORDER BY month), 4) AS mom_change
    FROM monthly
    """,
    doc="Month-over-month growth: monthly rollup (partial-agg shuffle to "
    "O(months) rows), then LAG over the tiny aggregate — the global "
    "single-partition window is safe precisely because it runs on "
    "months, not rows.",
)
def q_month_over_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 4).alias("mom_change"),
    )


@register(
    "q_latest_snapshot",
    oracle="""
    SELECT user_id, event_id, ROUND(value, 2) AS value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM (
        SELECT user_id, event_id, value, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
    doc="Latest-record-per-key (snapshot/SCD compaction): the newest event "
    "per user via a per-key top-1 window — the canonical change-log → "
    "current-state materialization for a lake. One shuffle on the key; "
    "row_number's top-1 is computed without holding the group (rank "
    "short-circuit), so per-key state is O(1) regardless of history depth.",
)
def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
    )


@register(
    "q_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1, 0)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT *, SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
               AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
    doc="Sessionization via Spark's NATIVE session_window aggregate (gap "
    "timeout 30 min) — one groupBy, no window-function program. Spark "
    "defines session end as last event + gap, which the gaps-and-islands "
    "oracle reproduces with MAX(ts) + INTERVAL 30 MINUTE. Same single "
    "user_id shuffle as q_sessionize; the two queries pin that the "
    "native operator and the window program agree.",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_max_concurrency",
    oracle="""
    WITH deltas AS (
        SELECT event_type, ts AS t, 1 AS delta FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL 1 HOUR AS t, -1 AS delta FROM events
    ),
    swept AS (
        SELECT event_type,
               SUM(delta) OVER (PARTITION BY event_type
                                ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS live
        FROM deltas
    )
    SELECT event_type, CAST(MAX(live) AS BIGINT) AS max_concurrent
    FROM swept
    GROUP BY event_type
    """,
    doc="Interval-overlap analytics via SEGMENTED sweep line: each event "
    "opens a 1-hour interval [ts, ts+1h); +1/-1 boundary deltas. A flat "
    "sweep (one running sum per type) puts ~2n/|types| rows in a single "
    "task — a giant-partition window at scale. Instead the boundaries are "
    "bucketed by hour so the running sum is computed per (type, bucket) "
    "segment — bounded partitions whose COUNT scales with the time span, "
    "not the row count. Per segment we keep (peak_local, bucket_sum); the "
    "per-type prefix sum over bucket totals (a tiny |types|x|buckets| "
    "table) gives each segment's entry offset, and the global peak is "
    "max(offset + peak_local). Ends sort before starts at equal time "
    "(delta ASC) so half-open intervals never self-overlap; equal times "
    "always share a bucket, so segmenting preserves the sweep order. Two "
    "shuffles: one on (type, bucket) for the fact-sized rows, one tiny "
    "one on type for the offsets.",
)
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    starts = e.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = e.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    deltas = starts.unionByName(ends).withColumn(
        "bucket", F.date_trunc("hour", F.col("t"))
    )
    # Segment-local running sum: partitions are (type, hour-bucket) — their
    # size is bounded by per-hour event volume regardless of total scale.
    w_seg = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = (
        deltas.select(
            "event_type",
            "bucket",
            "delta",
            F.sum("delta").over(w_seg).alias("local_run"),
        )
        # Same grouping keys as the window partitioning → Catalyst reuses
        # the exchange; this reduces 2n rows to |types|x|buckets|.
        .groupBy("event_type", "bucket")
        .agg(
            F.max("local_run").alias("peak_local"),
            F.sum("delta").alias("bucket_sum"),
        )
    )
    # Prefix the TINY per-bucket totals (rows = distinct hours x types) to
    # get each segment's entry concurrency, then fold map-side.
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        seg.select(
            "event_type",
            (
                F.coalesce(F.sum("bucket_sum").over(w_off), F.lit(0))
                + F.col("peak_local")
            ).alias("live"),
        )
        .groupBy("event_type")
        .agg(F.max("live").cast("bigint").alias("max_concurrent"))
    )


@register(
    "q_time_weighted_avg",
    oracle="""
    WITH spans AS (
        SELECT user_id, value,
               (epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id))
                - epoch_us(ts)) / 1000000.0 AS dt_sec
        FROM events
    )
    SELECT user_id,
           ROUND(SUM(value * dt_sec) / SUM(dt_sec), 4) AS twa_value,
           ROUND(SUM(dt_sec), 1) AS span_sec,
           COUNT(*) AS n_spans
    FROM spans
    WHERE dt_sec IS NOT NULL
    GROUP BY user_id
    """,
    doc="Time-weighted average over an irregular series: each reading "
    "holds until the next one (step interpolation), so the mean weights "
    "each value by its holding duration — the correct aggregate for "
    "unevenly-sampled gauges, where a plain AVG over-weights bursts. "
    "Partitioned by user/device id (high-cardinality at scale, unlike "
    "event_type): one keyed window shuffle + one agg.",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt_sec = (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")) / 1000000.0
    return (
        e.select("user_id", "value", dt_sec.alias("dt_sec"))
        .filter(F.col("dt_sec").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dt_sec")) / F.sum("dt_sec"), 4
            ).alias("twa_value"),
            F.round(F.sum("dt_sec"), 1).alias("span_sec"),
            F.count(F.lit(1)).alias("n_spans"),
        )
    )


@register(
    "q_ohlc",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS bar_start,
           ROUND(arg_min(value, ts), 2) AS open,
           ROUND(MAX(value), 2)         AS high,
           ROUND(MIN(value), 2)         AS low,
           ROUND(arg_max(value, ts), 2) AS close,
           COUNT(*)                     AS n_ticks
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="OHLC candlestick resampling: hourly bars per series with "
    "open/close via min_by/max_by on the tick timestamp (single-pass "
    "argmin/argmax aggregates — no sort, no self-join; the fixture's "
    "timestamps are unique so the tie-break is deterministic). One "
    "partial-agg shuffle on (series, bar); the classic financial "
    "downsampling primitive. Bars are over OBSERVED prices: both "
    "engines scope to non-null values explicitly — Spark's min_by "
    "returns a NULL value sitting at the bar edge while DuckDB's "
    "arg_min skips null args, so an implicit scope would diverge on a "
    "NULL-bearing fixture.",
)
def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return (
        e.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bar")
        )
        .agg(
            F.round(F.min_by("value", "ts"), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", "ts"), 2).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            "event_type",
            F.date_format("bar", "yyyy-MM-dd HH:00:00").alias("bar_start"),
            "open",
            "high",
            "low",
            "close",
            "n_ticks",
        )
    )


@register(
    "q_scd2",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_type, ts,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type, ts FROM marked
        WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts),
                    '%Y-%m-%d %H:%M:%S') AS valid_to,
           (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL)
               AS is_current
    FROM changes
    """,
    doc="SCD Type-2 dimension build from a changelog: consecutive equal "
    "attribute values compress away (gaps-and-islands LAG), each "
    "surviving change opens a validity interval closed by the next "
    "change's LEAD — the slowly-changing-dimension history table every "
    "warehouse maintains. Two windows over the same per-user "
    "partitioning, so Spark reuses one shuffle for both.",
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = marked.filter(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    valid_to = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(valid_to, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@register(
    "q_mad_outliers",
    oracle="""
    WITH nn AS (
        -- NULL discipline pinned on BOTH sides: Spark's collect_list
        -- drops NULLs while a window COUNT(*) would count them, so the
        -- whole query is defined over non-null values explicitly.
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
               COUNT(*)   OVER (PARTITION BY event_type) AS cnt
        FROM nn
    ),
    med AS (
        SELECT event_type, SUM(value) / COUNT(*) AS med
        FROM ranked WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
        GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM nn e JOIN med m USING (event_type)
    ),
    dev_ranked AS (
        SELECT event_type, adev,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev) AS rn,
               COUNT(*)   OVER (PARTITION BY event_type) AS cnt
        FROM dev
    ),
    mad AS (
        SELECT event_type, SUM(adev) / COUNT(*) AS mad
        FROM dev_ranked WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
        GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(MAX(d.med), 4) AS med,
           ROUND(MAX(m.mad), 4) AS mad,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    doc="Robust outlier detection by median absolute deviation: median "
    "and MAD are estimated with two grouped exact-median passes whose "
    "tiny per-group results broadcast back onto the stream — the "
    "breakdown-point-0.5 alternative to q_zscore_outliers (mean/stddev "
    "are dragged by the very outliers they're meant to find; the "
    "median isn't). Same two-pass + broadcast-join shape as zscore, so "
    "the fact table never re-shuffles. Both medians are RANK-BASED "
    "order statistics, not engine median() calls: each engine picks the "
    "two middle elements by row_number and averages them with the same "
    "two IEEE ops (sum of two doubles, divide by two), so med, adev, "
    "mad, and the 3*1.4826*mad threshold are all BIT-identical across "
    "engines and the strict outlier compare needs no rounding grid at "
    "all (an engine median() may interpolate as a+(b-a)/2 vs (a+b)/2 — "
    "a last-ulp difference that a 6dp round can still land on a tie; "
    "the q_winsorize convention, taken to its conclusion).",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Non-null scope matches the oracle's nn CTE exactly (collect_list
    # drops NULLs; a window COUNT(*) oracle would count them).
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())

    def _rank_median(df: DataFrame, col: str, alias: str) -> DataFrame:
        # sort_array(collect_list(...)), not a row_number window: the
        # exact median inherently buffers the group's values (engine
        # median() does too), but a window would additionally pull EVERY
        # fact row through one task per group. Middle elements averaged
        # with the same two IEEE ops as the oracle's SUM-of-two/2.
        grouped = df.groupBy("event_type").agg(
            F.sort_array(F.collect_list(col)).alias("s"),
            F.count(col).alias("cnt"),
        )
        lo = F.element_at("s", F.expr("int((cnt + 1) div 2)"))
        hi = F.element_at("s", F.expr("int((cnt + 2) div 2)"))
        return grouped.select("event_type", ((lo + hi) / 2).alias(alias))

    med = _rank_median(e, "value", "med")
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = _rank_median(dev, "adev", "mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 4).alias("med"),
            F.round(F.max("mad"), 4).alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("adev") > 3 * 1.4826 * F.col("mad")).cast("int"))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@register(
    "q_merge_upsert",
    oracle="""
    WITH base AS (
        SELECT user_id, value FROM (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
        ) WHERE rn = 1
    ),
    changes AS (
        SELECT user_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               value
        FROM (
            SELECT user_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        ) WHERE rn = 1
    )
    SELECT COALESCE(c.user_id, b.user_id) AS user_id,
           ROUND(CASE WHEN c.user_id IS NULL THEN b.value
                      ELSE c.value END, 2) AS value,
           CASE WHEN c.user_id IS NULL THEN 'kept'
                WHEN b.user_id IS NULL THEN 'inserted'
                ELSE 'updated' END AS action
    FROM base b
    FULL OUTER JOIN changes c ON b.user_id = c.user_id
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
    doc="Batch MERGE INTO (CDC apply): a snapshot (latest state per user "
    "before the cutoff) merged with a changelog (latest post-cutoff "
    "change per user; an 'error' event deletes the key) — WHEN MATCHED "
    "UPDATE / DELETE, WHEN NOT MATCHED INSERT, untouched keys pass "
    "through. The lakehouse-standard shape: both sides compact to "
    "latest-per-key first (top-1 windows, O(1) per-key state), so the "
    "FULL OUTER join — which cannot broadcast, by definition — joins "
    "two key-sized tables, never two history-sized ones. Batch twin of "
    "streaming/pipeline.py's materialize_latest_state foreachBatch "
    "merge; the output 'action' column is the merge audit a Delta/"
    "Iceberg MERGE reports as its operation metrics.",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cutoff = "2024-01-20 00:00:00"
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    base = (
        e.filter(F.col("ts") < cutoff)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("user_id").alias("b_user"), F.col("value").alias("b_value"))
    )
    changes = (
        e.filter(F.col("ts") >= cutoff)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("c_user"),
            F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
            F.col("value").alias("c_value"),
        )
    )
    return (
        base.join(changes, F.col("b_user") == F.col("c_user"), "full_outer")
        .filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce("c_user", "b_user").alias("user_id"),
            F.round(
                F.when(F.col("c_user").isNull(), F.col("b_value")).otherwise(
                    F.col("c_value")
                ),
                2,
            ).alias("value"),
            F.when(F.col("c_user").isNull(), "kept")
            .when(F.col("b_user").isNull(), "inserted")
            .otherwise("updated")
            .alias("action"),
        )
    )
