"""Scalar-function queries: string/regex, date, JSON, array/vector math.

The reference's only scalar logic is path-string surgery and date
arithmetic (parquet_compactor.py:188-189,236-244,275,286-289 — split/regex/
strftime/relativedelta). Here those function families become column
expressions over the analytic tables, plus the array/JSON families the
fixtures carry (events.props JSON, embeddings.embedding array<float>).

Everything stays JVM-side (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_compactor_spark.registry import load, load_ntz, register


@register(
    "q_string_extract",
    oracle="""
    SELECT CAST(regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS BIGINT) AS cust_id,
           upper(c_mktsegment)  AS seg_upper,
           length(c_name)       AS name_len,
           substr(c_name, 1, 8) AS name_prefix
    FROM customer
    WHERE c_name LIKE 'Customer#%'
    """,
    doc="String surgery — regexp_extract/upper/length/substr. Mirrors the "
    "reference's partition-key extraction (determine_base_file_name, "
    "parquet_compactor.py:236-244) as a columnar regexp_extract.",
)
def q_string_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").like("Customer#%")).select(
        F.regexp_extract("c_name", r"Customer#([0-9]+)", 1).cast("bigint").alias("cust_id"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
    )


@register(
    "q_date_buckets",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m')     AS order_month,
           COUNT(*)                           AS n_orders,
           ROUND(SUM(o_totalprice), 2)        AS month_revenue
    FROM orders
    GROUP BY strftime(o_orderdate, '%Y-%m')
    """,
    doc="Date bucketing: month truncation → agg. Mirrors the reference's "
    "year=/month= partition convention (parquet_compactor.py:252-255) as a "
    "date_format expression; on a partitioned lake this prunes instead.",
)
def q_date_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("month_revenue"),
        )
    )


@register(
    "q_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS VARCHAR)       AS order_day,
           CAST(strftime(CAST(o_orderdate AS DATE) + 90, '%Y-%m-%d') AS VARCHAR)  AS due_day,
           CAST(date_part('dow', CAST(o_orderdate AS DATE)) AS INT)               AS order_dow
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '2000-01-01'
    """,
    doc="Date arithmetic: day addition (the reference's 5-day hold-back "
    "relativedelta, parquet_compactor.py:275) and day-of-week extraction. "
    "Representation-proofed (round-6 sweep): NTZ read + DATE cast + "
    "date_add — calendar day arithmetic on DATEs is session/DST-free, "
    "unlike `timestamp + INTERVAL 90 DAYS` (a duration under LTZ "
    "inference, which shifts the rendered due_day across DST).",
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime

    o = load_ntz(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.filter(d >= F.lit(datetime.date(2000, 1, 1))).select(
        "o_orderkey",
        d.cast("string").alias("order_day"),
        F.date_add(d, 90).cast("string").alias("due_day"),
        # Spark dayofweek: 1=Sunday; DuckDB dow: 0=Sunday.
        (F.dayofweek(d) - F.lit(1)).cast("int").alias("order_dow"),
    )


@register(
    "q_json_props",
    oracle="""
    SELECT event_type,
           COUNT(*)                                                        AS n_events,
           ROUND(AVG(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)), 4) AS avg_k,
           ROUND(SUM(value), 2)                                            AS total_value
    FROM events
    WHERE CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) >= 50
    GROUP BY event_type
    """,
    doc="JSON property extraction over events.props ({\"k\": int}); "
    "get_json_object on the Spark side, regex on both sides for oracle "
    "parity (avoids DuckDB json-extension dependency).",
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.withColumn("k", k)
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "q_vector_norm",
    oracle="""
    SELECT vec_id,
           label,
           len(embedding) AS dim,
           ROUND(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
    FROM embeddings
    """,
    doc="Array math over embedding array<float>: per-row L2 norm via "
    "transform+aggregate — all JVM-side higher-order functions, no UDF.",
)
def q_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    sumsq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sumsq), 4).alias("l2_norm"),
    )


@register(
    "q_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_start,
           event_type,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour window aggregation on events (batch form of the "
    "streaming pipeline in parquet_compactor_spark.streaming — same window "
    "semantics, oracle-checkable). events.ts is parquet-ns; hour truncation "
    "makes Spark-us vs DuckDB-ns precision moot.",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00:00").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_case_bucketing",
    oracle="""
    SELECT CASE
             WHEN o_totalprice < 1000  THEN 'small'
             WHEN o_totalprice < 10000 THEN 'medium'
             ELSE 'large'
           END AS price_band,
           o_orderstatus,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY 1, 2
    """,
    doc="CASE/WHEN bucketing + min/max aggregation.",
)
def q_case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 1000, "small")
        .when(F.col("o_totalprice") < 10000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(band.alias("price_band"), F.col("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@register(
    "q_map_props",
    oracle="""
    WITH parsed AS (
        SELECT event_id,
               CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        FROM events
    )
    SELECT event_id,
           2              AS n_entries,
           'bucket,k'     AS keys_csv,
           k * 2          AS k_doubled,
           k // 10        AS bucket
    FROM parsed
    WHERE event_id % 7 = 0
    """,
    doc="MapType pipeline over events.props: from_json to map<string,bigint>, "
    "map_concat a derived entry, transform_values, sorted map_keys, "
    "element_at — the map-function family end-to-end, all JVM-side. "
    "(Oracle side replicates the arithmetic; DuckDB lacks Spark maps.)",
)
def q_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    m = F.from_json("props", "map<string,bigint>")
    enriched = F.map_concat(
        m, F.create_map(F.lit("bucket"), F.element_at(m, "k") / F.lit(10))
    )
    doubled = F.transform_values(enriched, lambda k, v: v * 2)
    return e.select(
        "event_id",
        F.size(enriched).alias("n_entries"),
        F.concat_ws(",", F.array_sort(F.map_keys(enriched))).alias("keys_csv"),
        (F.element_at(doubled, "k")).cast("bigint").alias("k_doubled"),
        F.floor(F.element_at(enriched, "bucket")).cast("bigint").alias("bucket"),
    )


@register(
    "q_math_fns",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           ROUND(sqrt(l_extendedprice), 4)        AS root_price,
           ROUND(ln(l_extendedprice), 4)          AS ln_price,
           ROUND(log10(l_extendedprice), 4)       AS log10_price,
           ROUND(power(1 + l_discount, 3), 4)     AS compound3,
           ROUND(exp(l_discount), 4)              AS exp_disc,
           ROUND(abs(l_tax - 0.04), 4)            AS tax_dev,
           CAST(sign(l_quantity - 25) AS INT)     AS qty_side,
           CAST(ceil(l_quantity / 7) AS BIGINT)   AS qty_ceil7,
           CAST(floor(l_quantity / 7) AS BIGINT)  AS qty_floor7,
           l_orderkey % 7                         AS key_mod7,
           ROUND(greatest(l_tax, l_discount), 4)  AS max_rate
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
    doc="Scalar math family (sqrt/ln/log10/power/exp/abs/sign/ceil/floor/"
    "mod/greatest) — IEEE-double built-ins, bit-identical across engines, "
    "rounded defensively. All whole-stage-codegen row ops: zero shuffles.",
)
def q_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 4).alias("root_price"),
        F.round(F.log("l_extendedprice"), 4).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 4).alias("log10_price"),
        F.round(F.pow(F.lit(1) + F.col("l_discount"), 3), 4).alias("compound3"),
        F.round(F.exp("l_discount"), 4).alias("exp_disc"),
        F.round(F.abs(F.col("l_tax") - 0.04), 4).alias("tax_dev"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("qty_side"),
        F.ceil(F.col("l_quantity") / 7).cast("bigint").alias("qty_ceil7"),
        F.floor(F.col("l_quantity") / 7).cast("bigint").alias("qty_floor7"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.round(F.greatest("l_tax", "l_discount"), 4).alias("max_rate"),
    )


@register(
    "q_array_fns",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                       AS n_tokens,
           len(list_distinct(string_split(text, ' ')))        AS n_unique,
           array_to_string(string_split(text, ' ')[1:3], '-') AS head3,
           string_split(text, ' ')[-1]                        AS last_token,
           array_to_string(
               list_sort(list_distinct(string_split(text, ' ')))[1:3], '-'
           )                                                  AS first3_sorted,
           list_sort(string_split(text, ' '), 'DESC')[1]      AS max_token,
           COALESCE(list_position(string_split(text, ' '), 'data'), 0)
                                                              AS data_pos,
           list_contains(string_split(text, ' '), 'data')     AS has_data
    FROM documents
    WHERE doc_id % 4 = 0
    """,
    doc="Array-function family (size/distinct/slice/element_at/sort/"
    "position/contains/join) over tokenized text — all JVM codegen'd "
    "array ops on one split() subexpression (Catalyst CSE dedupes the "
    "tokenization), zero shuffles. DuckDB twin uses the list_* family.",
)
def q_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    toks = F.split(F.col("text"), " ", -1)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.array_join(F.slice(toks, 1, 3), "-").alias("head3"),
        F.element_at(toks, -1).alias("last_token"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), "-"
        ).alias("first3_sorted"),
        F.sort_array(toks, asc=False).getItem(0).alias("max_token"),
        F.array_position(toks, "data").alias("data_pos"),
        F.array_contains(toks, "data").alias("has_data"),
    )


@register(
    "q_higher_order_fns",
    oracle="""
    SELECT vec_id,
           ROUND(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                             (a, b) -> a + b), 4)                    AS vec_sum,
           len(list_filter(embedding, x -> x > 0))                   AS n_pos,
           len(list_filter(embedding, x -> x > 0.3)) > 0             AS any_gt,
           len(list_filter(embedding, x -> abs(x) <= 1.0)) = len(embedding)
                                                                     AS all_unit,
           ROUND(list_max(list_transform(embedding,
                                         x -> CAST(abs(x) AS DOUBLE))), 4)
                                                                     AS linf
    FROM embeddings
    WHERE vec_id % 7 = 0
    """,
    doc="Higher-order array functions (transform/filter/exists/forall/"
    "aggregate) over the embedding vector column — lambda expressions "
    "evaluated JVM-side inside codegen, zero Python and zero shuffles; "
    "the DuckDB twin is the list_* lambda family.",
)
def q_higher_order_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 7 == 0)
    v = F.col("embedding")
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(
                F.transform(v, lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("vec_sum"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.exists(v, lambda x: x > 0.3).alias("any_gt"),
        F.forall(v, lambda x: F.abs(x) <= 1.0).alias("all_unit"),
        F.round(
            F.array_max(F.transform(v, lambda x: F.abs(x).cast("double"))), 4
        ).alias("linf"),
    )


@register(
    "q_sliding_window",
    oracle="""
    WITH contrib AS (
        SELECT date_trunc('hour', ts)                   AS w0, event_type, value
        FROM events
        UNION ALL
        SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS w0, event_type, value
        FROM events
    )
    SELECT strftime(w0, '%Y-%m-%d %H:00:00') AS win_start,
           event_type,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM contrib
    GROUP BY 1, 2
    """,
    doc="Sliding (hopping) window aggregation: 2-hour windows every hour, "
    "so each event contributes to exactly two windows. Spark's window() "
    "expands contributions map-side (one Expand, one shuffle); the same "
    "expression is streaming-legal with a watermark. The oracle spells "
    "the expansion as a two-branch UNION ALL.",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00:00").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_safe_math",
    oracle="""
    SELECT event_id,
           CASE WHEN CAST(event_id % 3 AS DOUBLE) = 0.0 THEN NULL
                ELSE ROUND(value / CAST(event_id % 3 AS DOUBLE), 4)
           END                                          AS safe_ratio,
           TRY_CAST(substr(event_type, 1, 3) AS INT)    AS bad_cast,
           TRY_CAST(CAST(event_id AS VARCHAR) AS INT)   AS good_cast
    FROM events
    """,
    doc="ANSI-safe arithmetic surface: try_divide nulls instead of "
    "erroring on zero denominators, try_cast nulls on malformed input — "
    "the error-tolerant expressions a lake pipeline needs when one bad "
    "row must not kill a 100 TB job. Oracle expresses the identical "
    "semantics via CASE and TRY_CAST.",
)
def q_safe_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    denom = (F.col("event_id") % 3).cast("double")
    return e.select(
        "event_id",
        F.round(F.try_divide(F.col("value"), denom), 4).alias("safe_ratio"),
        F.substring("event_type", 1, 3).try_cast("int").alias("bad_cast"),
        F.col("event_id").cast("string").try_cast("int").alias("good_cast"),
    )


@register(
    "q_explode_outer",
    oracle="""
    WITH lists AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> length(x) > 9) AS longs
        FROM documents
    )
    SELECT doc_id,
           CAST(len(longs) AS INT) AS n_long,
           unnest(CASE WHEN longs IS NULL OR len(longs) = 0
                       THEN [NULL] ELSE longs END)
               AS long_token
    FROM lists
    """,
    doc="explode_outer semantics: documents with NO qualifying array "
    "elements keep one row with a NULL element (a plain explode silently "
    "drops them — the classic lost-rows bug in lateral expansion). The "
    "oracle emulates outer unnest with a [NULL] placeholder list — "
    "covering the NULL-text doc too (split(NULL) is a NULL array; "
    "explode_outer keeps its row, so the oracle's placeholder must fire "
    "on IS NULL as well as empty — r7 hostile NULL-text sweep find).",
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    longs = F.filter(F.split("text", " ", -1), lambda x: F.length(x) > 9)
    return d.select(
        "doc_id",
        F.size(longs).cast("int").alias("n_long"),
        F.explode_outer(longs).alias("long_token"),
    )


@register(
    "q_variant_props",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)                          AS n_events,
           CAST(SUM(CAST(props::JSON->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(props::JSON->>'k' AS BIGINT)) AS BIGINT) AS max_k,
           CAST(SUM(CASE WHEN props::JSON->>'missing' IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)       AS n_missing
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured VARIANT ingestion (Spark 4): parse_json turns "
    "the props JSON string into a binary VARIANT once, then typed "
    "variant_get path extraction feeds ordinary aggregates — no schema "
    "declared up front, unlike from_json (q_json_props's route). At "
    "100 TB VARIANT's binary encoding beats re-parsing JSON text per "
    "access, and shredded parquet storage (Spark 4.1) pushes path "
    "reads down to the scan. Missing paths are SQL NULLs (n_missing "
    "counts them); schema_of_variant introspects per row.",
)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json("props").alias("pv")
    )
    k = F.expr("variant_get(pv, '$.k', 'bigint')")
    missing = F.expr("variant_get(pv, '$.missing', 'string')")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.sum(F.when(missing.isNull(), 1).otherwise(0)).alias("n_missing"),
    )
