"""Advanced relational coverage: grouping sets, pivot, subqueries,
percentiles, array aggregation, approximate sketches.

These round out SURVEY.md §2B beyond the first wave — each remains a pure
Catalyst plan (Expand for grouping sets/pivot, subquery broadcast for the
scalar subquery, sort-based percentile) with the same oracle conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_compactor_spark.registry import load, register


@register(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           GROUPING(o_orderstatus)  AS g_status,
           GROUPING(o_orderpriority) AS g_priority
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS with GROUPING() markers — one Expand pass, "
    "no multiple scans of the fact table.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               CAST(GROUPING(o_orderstatus) AS INT)  AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q_pivot",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (o_orderpriority = '1-URGENT')        AS urgent,
           COUNT(*) FILTER (o_orderpriority = '2-HIGH')          AS high,
           COUNT(*) FILTER (o_orderpriority = '3-MEDIUM')        AS medium,
           COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS not_specified,
           COUNT(*) FILTER (o_orderpriority = '5-LOW')           AS low
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Pivot (long→wide): priority counts per order status. Spark PIVOT "
    "with an explicit value list compiles to a single-pass conditional "
    "aggregate — no per-column scans.",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .agg(F.count(F.lit(1)))
        .withColumnsRenamed(
            {
                "1-URGENT": "urgent",
                "2-HIGH": "high",
                "3-MEDIUM": "medium",
                "4-NOT SPECIFIED": "not_specified",
                "5-LOW": "low",
            }
        )
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
    """,
    doc="Scalar subquery in a predicate: orders above 2x the mean price. "
    "Catalyst evaluates the subquery once and broadcasts the scalar.",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_ss")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
        FROM _orders_ss
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM _orders_ss)
        """
    )


@register(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4)  AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (Spark percentile == "
    "DuckDB quantile_cont, both linear interpolation). At 100 TB, swap to "
    "approx_percentile (t-digest sketch, see q_approx_stats) — exact "
    "percentile needs the full group sorted.",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    # ONE percentile aggregate with an array of fractions (r14): three
    # separate percentile() aggs each buffered AND sorted the full
    # per-group value multiset independently — 3x the memory and 3x the
    # sort of the same data (guide §1.2). The array form interpolates
    # all three fractions from one sorted buffer; the Percentile
    # expression's per-fraction interpolation is the identical IEEE
    # computation, so the rounded outputs are bit-identical.
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))"
            ).alias("ps")
        )
        .select(
            "l_returnflag",
            F.round(F.col("ps")[0], 4).alias("p50"),
            F.round(F.col("ps")[1], 4).alias("p90"),
            F.round(F.col("ps")[2], 4).alias("p99"),
        )
    )


@register(
    "q_approx_stats",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS hll_within_tol,
           TRUE AS p50_within_rank
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Approximate sketch aggregates — approx_count_distinct (HLL++, "
    "rsd=0.01) and approx_percentile (t-digest) — the constant-memory "
    "versions of q_agg_distinct/q_percentiles that run at any scale. "
    "DERIVED-INVARIANT ORACLE: the estimates themselves are "
    "engine-specific, so the query emits engine-independent derived "
    "booleans — HLL estimate within 5% of exact (5 sigma at rsd=0.01), "
    "and the sketch's p50 landing between its own 0.45/0.55 evaluations "
    "(digest self-consistency: querying one t-digest at increasing "
    "percentiles is monotone, so this is a plan/plumbing invariant, not "
    "a statistical one) — stated as TRUE alongside the exact counts the "
    "oracle can verify. The STATISTICAL rank-error check (approx p50 vs "
    "the EXACT 0.45/0.55 quantiles, which needs a full per-group value "
    "buffer) lives in a test-only twin "
    "(tests/test_oracle.py::test_approx_stats_p50_within_exact_rank_"
    "bound), keeping the registered sketch pass literally "
    "constant-memory at any scale.",
)
def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    # The exact-distinct aggregate runs in its OWN plan and broadcast-joins
    # back (3 rows). Mixing countDistinct with the typed-imperative sketch
    # aggregates in one agg forces Catalyst's distinct rewrite: an Expand
    # doubles every input row and the whole aggregation falls out of hash
    # aggregation — measured 108 s (and an OOM on a default heap) vs 2.6 s
    # split, at sf0.1. Two scans beat one 2x-expanded sort-agg scan at any
    # scale; at 100 TB the sketch pass stays partial-aggregated and
    # constant-memory, which is this query's whole point. One t-digest
    # buffer evaluated at three percentiles (round 8: the exact
    # percentile(array(0.45, 0.55)) rank-bound scaffolding moved to the
    # test-only twin — it was the single non-constant-memory aggregate
    # left in this plan).
    sketches = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("acd"),
        F.expr(
            "approx_percentile(l_extendedprice, array(0.45, 0.5, 0.55))"
        ).alias("ap"),
    )
    exact = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders")
    ).withColumnRenamed("l_returnflag", "rf_e")
    return (
        # eqNullSafe: a NULL returnflag group must survive the join —
        # both aggs produce it and the oracle's GROUP BY keeps it; an
        # inner USING-join would silently drop it (NULL keys never
        # match). Still a broadcast HASH join (null-safe equi-key).
        sketches.join(
            F.broadcast(exact),
            sketches["l_returnflag"].eqNullSafe(exact["rf_e"]),
        )
        .select(
            "l_returnflag",
            "n_rows",
            "exact_orders",
            # 0/0 guard: a group whose l_orderkey values are all NULL has
            # exact_orders = 0; the estimate is within tolerance iff it
            # is also 0 (the oracle states the invariant as TRUE).
            F.when(F.col("exact_orders") == 0, F.col("acd") == 0)
            .otherwise(
                F.abs(F.col("acd") - F.col("exact_orders"))
                / F.col("exact_orders")
                <= 0.05
            )
            .alias("hll_within_tol"),
            F.element_at("ap", 2)
            .between(F.element_at("ap", 1), F.element_at("ap", 3))
            .alias("p50_within_rank"),
        )
    )


@register(
    "q_array_agg",
    oracle="""
    SELECT n_regionkey AS regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    """,
    doc="Array aggregation: collect per-group values into a sorted list "
    "(emitted as a joined string — sorted → deterministic, and scalar "
    "output hashes identically across engines).",
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.groupBy(F.col("n_regionkey").alias("regionkey")).agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )


@register(
    "q_explode_posexplode",
    oracle="""
    SELECT u.vec_id,
           CAST(u.idx - 1 AS INT)            AS pos,
           ROUND(CAST(u.val AS DOUBLE), 4)   AS component
    FROM (SELECT vec_id,
                 unnest(embedding) AS val,
                 generate_subscripts(embedding, 1) AS idx
          FROM embeddings WHERE vec_id < 3) u(vec_id, val, idx)
    WHERE (u.idx - 1) % 16 = 0
    """,
    doc="Lateral array explode with position (posexplode ≡ "
    "generate_subscripts): flattens vectors to (vec_id, pos, value) rows.",
)
def q_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return (
        e.filter(F.col("vec_id") < 3)
        .select("vec_id", F.posexplode("embedding").alias("pos", "component"))
        .filter(F.col("pos") % 16 == 0)
        .select(
            "vec_id",
            "pos",
            F.round(F.col("component").cast("double"), 4).alias("component"),
        )
    )


@register(
    "q_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*)                         AS n_orders,
           ROUND(SUM(o_totalprice), 2)      AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE aggregation: all 2^2 grouping combinations in one pass "
    "(completes the rollup/grouping-sets family). Spark expands cube "
    "groupings before the hash agg — still a single shuffle with map-side "
    "partials; grouping-null slots labeled 'ALL' on both engines.",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "q_median_filtered",
    oracle="""
    SELECT event_type,
           ROUND(MEDIAN(value), 4)                          AS median_value,
           COUNT(*) FILTER (WHERE value > 0)                AS n_positive,
           ROUND(AVG(value) FILTER (WHERE value > 0), 4)    AS avg_positive,
           COUNT(*)                                         AS n_rows
    FROM events
    GROUP BY event_type
    """,
    doc="Exact median (interpolated, == percentile 0.5 both engines) plus "
    "FILTER-clause conditional aggregates (count/avg over a predicate "
    "without a self-join) — single hash agg, one shuffle.",
)
def q_median_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    pos = F.when(F.col("value") > 0, F.col("value"))
    return e.groupBy("event_type").agg(
        F.round(F.median("value"), 4).alias("median_value"),
        F.count(pos).alias("n_positive"),
        F.round(F.avg(pos), 4).alias("avg_positive"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q_unpivot",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               ROUND(SUM(l_quantity), 2)      AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               ROUND(SUM(l_discount), 2)      AS sum_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty'   AS measure, sum_qty   AS amount FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS measure, sum_price AS amount FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_disc'  AS measure, sum_disc  AS amount FROM wide
    """,
    doc="Unpivot (wide metrics -> long (measure, amount) rows) — the "
    "inverse of q_pivot, via the native melt/Expand operator (one pass, no "
    "UNION re-scan of the input; the oracle spells it as UNION ALL).",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    wide = l.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="amount",
    )


@register(
    "q_string_fns",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                          AS brand_upper,
           lower(p_type)                           AS type_lower,
           strlen(p_name)                          AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0')   AS size_padded,
           replace(p_name, ' ', '_')               AS name_snake,
           strpos(p_name, 'widget')                AS widget_pos,
           levenshtein(p_brand, 'Brand#10')        AS brand_dist,
           reverse(p_brand)                        AS brand_rev,
           left(p_name, 5)                         AS name_head,
           string_split(p_name, ' ')[1]            AS first_word,
           concat_ws('|', p_brand, p_type)         AS brand_type
    FROM part
    WHERE p_partkey % 3 = 0
    """,
    doc="String-function family: upper/lower/length/lpad/replace/instr/"
    "levenshtein/reverse/left/split/concat_ws — all codegen'd row ops, "
    "zero shuffles.",
)
def q_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 3 == 0)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.instr(F.col("p_name"), "widget").alias("widget_pos"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#10")).alias("brand_dist"),
        F.reverse("p_brand").alias("brand_rev"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.split("p_name", " ", -1).getItem(0).alias("first_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "q_window_ntile",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           NTILE(4)       OVER w                  AS quartile,
           ROUND(PERCENT_RANK() OVER w, 4)        AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 4)        AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal NULLS LAST, c_custkey)
    """,
    doc="Distribution window functions: NTILE quartiles, PERCENT_RANK and "
    "CUME_DIST per market segment (ordered by balance, custkey tiebreak "
    "for cross-engine determinism). One shuffle on the segment key. "
    "NULL placement is EXPLICIT on both sides: Spark's ascending "
    "default is NULLS FIRST, DuckDB's is NULLS LAST — an implicit "
    "order diverges the moment the order column carries a NULL.",
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.asc_nulls_last("c_acctbal"), "c_custkey"
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


@register(
    "q_corr_covar",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 4)       AS qty_price_corr,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           ROUND(COVAR_POP(l_discount, l_tax), 6) + 0.0      AS disc_tax_covar_pop
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Bivariate statistics aggregates: correlation and sample/population "
    "covariance per group — single-pass distributive moments, partial-agg "
    "map-side like any sum.",
)
def q_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.covar_pop("l_discount", "l_tax"), 6).alias("disc_tax_covar_pop"),
    )


@register(
    "q_bit_bool_agg",
    oracle="""
    SELECT event_type,
           CAST(BIT_AND(event_id) AS BIGINT) AS ids_and,
           CAST(BIT_OR(event_id)  AS BIGINT) AS ids_or,
           CAST(BIT_XOR(event_id) AS BIGINT) AS ids_xor,
           BOOL_AND(value >= 0)              AS all_nonneg,
           BOOL_OR(value > 99)               AS any_large
    FROM events
    GROUP BY event_type
    """,
    doc="Bitwise and boolean aggregates per group: BIT_AND/OR/XOR over ids "
    "(XOR doubles as an order-independent set checksum) and BOOL_AND/OR "
    "predicates — all distributive, one partial-agg shuffle.",
)
def q_bit_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bit_and("event_id").alias("ids_and"),
        F.bit_or("event_id").alias("ids_or"),
        F.bit_xor("event_id").alias("ids_xor"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 99).alias("any_large"),
    )


@register(
    "q_string_agg",
    oracle="""
    SELECT r.r_name,
           STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="Ordered string aggregation (LISTAGG): nation names per region, "
    "comma-joined in name order. Spark form: collect_list → array_sort → "
    "concat_ws (deterministic regardless of partition arrival order — "
    "the only safe way to listagg distributed data).",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "q_value_histogram",
    oracle="""
    SELECT GREATEST(0, LEAST(9, CAST(FLOOR(c_acctbal / 1000.0) AS INT))) AS bucket,
           COUNT(*)                    AS n,
           ROUND(MIN(c_acctbal), 2)    AS lo,
           ROUND(MAX(c_acctbal), 2)    AS hi
    FROM customer
    GROUP BY 1
    """,
    doc="Equi-width histogram binning via explicit floor arithmetic "
    "(portable across engines, clamped edge buckets): distribution "
    "profiling as a single partial-agg pass — bucket count is constant, "
    "so shuffle traffic is O(buckets) at any scale.",
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    bucket = F.greatest(
        F.lit(0), F.least(F.lit(9), F.floor(F.col("c_acctbal") / 1000.0).cast("int"))
    )
    return c.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("lo"),
        F.round(F.max("c_acctbal"), 2).alias("hi"),
    )


@register(
    "q_equidepth_hist",
    oracle="""
    WITH bounds AS (
        SELECT quantile_cont(o_totalprice,
                             [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS b
        FROM orders
    )
    SELECT len(list_filter(b, x -> ROUND(x, 6) <= o_totalprice)) + 1 AS decile,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders CROSS JOIN bounds
    GROUP BY 1
    """,
    doc="Equi-depth (decile) histogram without a global sort: exact "
    "interpolated decile boundaries come from one percentile aggregate "
    "(9 doubles), broadcast back, and each row finds its bucket by "
    "counting boundaries at or below it — a per-row lambda over a "
    "9-element literal. The naive NTILE form is a single-partition "
    "window over every row; this is one agg + one map. Both engines "
    "round the boundary to 6dp before the <= compare: the true "
    "boundary x0 + (x1-x0)*f has at most 3 decimals (2dp data, f a "
    "multiple of 0.1), so a last-ulp difference between the engines' "
    "interpolation formulas can never flip the bucket edge.",
)
def q_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(
        F.percentile(
            "o_totalprice", F.array(*[F.lit(i / 10) for i in range(1, 10)])
        ).alias("b")
    )
    bucket = (
        F.size(F.filter("b", lambda x: F.round(x, 6) <= F.col("o_totalprice"))) + 1
    ).alias("decile")
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "q_profile",
    oracle="""
    SELECT 'l_quantity' AS column_name,
           COUNT(l_quantity) AS n,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           ROUND(MIN(l_quantity), 4) AS min_v,
           ROUND(MAX(l_quantity), 4) AS max_v,
           ROUND(AVG(l_quantity), 4) AS avg_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(l_extendedprice),
           CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
           COUNT(DISTINCT l_extendedprice),
           ROUND(MIN(l_extendedprice), 4), ROUND(MAX(l_extendedprice), 4),
           ROUND(AVG(l_extendedprice), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(l_discount),
           CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
           COUNT(DISTINCT l_discount),
           ROUND(MIN(l_discount), 4), ROUND(MAX(l_discount), 4),
           ROUND(AVG(l_discount), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(l_tax),
           CAST(COUNT(*) - COUNT(l_tax) AS BIGINT),
           COUNT(DISTINCT l_tax),
           ROUND(MIN(l_tax), 4), ROUND(MAX(l_tax), 4),
           ROUND(AVG(l_tax), 4)
    FROM lineitem
    """,
    doc="One-pass data profiling: per-column null/distinct/min/max/avg "
    "for four measures computed in a SINGLE scan and aggregate (the "
    "long-format result is a 4-row select over the 1-row aggregate), "
    "where the oracle's UNION ALL form re-scans the table per column. "
    "The profile-before-you-train hygiene step, at scan cost 1x "
    "regardless of column count.",
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            F.round(F.min(c), 4).alias(f"{c}__min_v"),
            F.round(F.max(c), 4).alias(f"{c}__max_v"),
            F.round(F.avg(c), 4).alias(f"{c}__avg_v"),
        ]
    one = li.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__n_null").alias("n_null"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min_v").alias("min_v"),
            F.col(f"{c}__max_v").alias("max_v"),
            F.col(f"{c}__avg_v").alias("avg_v"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


@register(
    "q_hll_sketch",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS within_tol
    FROM events
    GROUP BY event_type
    """,
    doc="Mergeable cardinality sketches: hll_sketch_agg builds a "
    "DataSketches HLL per group and hll_sketch_estimate reads it. The "
    "sketch IS the partial-aggregation state — map-side sketches merge "
    "associatively across 1000 executors in bytes per group, which is "
    "how you count distinct users over 100 TB without shuffling the "
    "keys themselves. Oracle contract: the exact per-group distinct "
    "counts match SQL, and within_tol asserts the HLL estimate landed "
    "within 5% of exact (lgK=12 standard error is ~1.6%, so TRUE is "
    "the invariant, which the oracle states literally — the estimate "
    "itself is engine-specific and lives in the rows-only twin "
    "q_hll_sketch_state).",
)
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
                "approx_users"
            ),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            # Guard the all-null-users group: exact = 0 would make the
            # ratio NULL (never TRUE) — there the invariant is simply
            # that the sketch also saw nothing.
            F.when(F.col("exact_users") == 0, F.col("approx_users") == 0)
            .otherwise(
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            )
            .alias("within_tol"),
        )
    )


@register(
    "q_hll_sketch_state",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS within_tol,
           TRUE AS merge_consistent
    FROM events
    GROUP BY event_type
    """,
    doc="Mergeability twin of q_hll_sketch: the point of persisted "
    "DataSketches HLL state is that daily sketches union-merge into "
    "monthly cardinalities without rescanning. DERIVED-INVARIANT ORACLE: "
    "the sketch bytes are engine-specific, so the query PROVES the "
    "merge algebra instead — it splits users into two disjoint halves by "
    "hash, builds one sketch per half, hll_union_agg-merges them, and "
    "emits merge_consistent = (merged estimate ~= whole-corpus estimate, "
    "rel diff <= 1%) plus within_tol (estimate within 5% of exact). The "
    "oracle states both invariants as TRUE alongside the exact counts. "
    "Sketch-bytes round-trip via storage is pinned in tests.",
)
def q_hll_sketch_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    halves = (
        e.withColumn("half", F.pmod(F.xxhash64("user_id"), F.lit(2)))
        .groupBy("event_type", "half")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    merged = halves.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.expr("hll_union_agg(sk)")).alias("est_merged")
    )
    full = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_full"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    guard = F.greatest(F.col("exact_users"), F.lit(1)).cast("double")
    return full.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        (F.abs(F.col("est_full") - F.col("exact_users")) / guard <= 0.05).alias(
            "within_tol"
        ),
        (
            F.abs(F.col("est_merged") - F.col("est_full"))
            / F.greatest(F.col("est_full"), F.lit(1.0))
            <= 0.01
        ).alias("merge_consistent"),
    )


@register(
    "q_heavy_hitters",
    oracle="""
    WITH c AS (SELECT event_type, user_id, COUNT(*) AS n
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, n,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC) AS rk
          FROM c)
    SELECT event_type,
           string_agg(CAST(n AS VARCHAR), ',' ORDER BY n DESC) AS top_counts,
           TRUE AS counts_exact
    FROM r WHERE rk <= 5
    GROUP BY event_type
    """,
    doc="Approximate heavy hitters: approx_top_k(user_id, 5) per "
    "event_type — the mergeable frequent-items sketch for 'top domains / "
    "hottest keys over 100 TB'. Map-side sketches combine associatively "
    "in KBs per group, so the hot-key census never shuffles raw keys. "
    "DERIVED-INVARIANT ORACLE: which user fills a slot is ambiguous "
    "under count ties, but the top-5 COUNT MULTISET is deterministic — "
    "the query emits the sketch's counts sorted descending and "
    "counts_exact = (every sketch count equals the true count of the "
    "item it reports, via join-back), both engine-independent with "
    "maxItemsTracked >= group cardinality; the oracle computes the true "
    "top-5 counts exactly.",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    items = (
        e.groupBy("event_type")
        .agg(F.expr("approx_top_k(user_id, 5, 100000)").alias("top"))
        .select("event_type", F.explode("top").alias("hh"))
        .select(
            "event_type",
            F.col("hh.item").alias("user_id"),
            F.col("hh.count").alias("n_events"),
        )
    )
    exact = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n_true"))
    return (
        items.join(exact, ["event_type", "user_id"])
        .groupBy("event_type")
        .agg(
            F.concat_ws(
                ",", F.reverse(F.array_sort(F.collect_list("n_events")))
            ).alias("top_counts"),
            F.every(F.col("n_events") == F.col("n_true")).alias("counts_exact"),
        )
    )


@register(
    "q_kll_quantiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS exact_p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4)  AS exact_p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS exact_p99,
           TRUE AS p50_rank_ok,
           TRUE AS p90_rank_ok,
           TRUE AS p99_rank_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Mergeable quantile sketches: kll_sketch_agg_double over "
    "l_extendedprice per return flag, read back at p50/p90/p99. The "
    "sketch IS the partial-agg state — per-executor KLL sketches merge "
    "associatively in KBs, which is how you track price distributions "
    "over 100 TB without a global sort. KLL gives a priori rank-error "
    "bounds (~1.7% at default k=200). DERIVED-INVARIANT ORACLE: the "
    "sketch quantile values are engine-specific, but KLL's rank bound "
    "is not — each pXX_rank_ok asserts the sketch's quantile lands "
    "between the exact (XX-2.5%) and (XX+2.5%) quantiles (p99 clamped "
    "to max), which the oracle states as TRUE alongside the exact "
    "quantiles it verifies directly.",
)
def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    # ONE percentile buffer for all nine fractions (exact quantiles +
    # rank bounds): each fraction interpolates independently from the
    # same per-group sorted multiset, so splitting them across two
    # aggregates only doubled the buffered values and the per-group
    # sort — the q_percentiles single-buffer rule. Indices 1-3 are the
    # exact quantiles, 4-9 the rank bounds at XX±2.5% (the documented
    # invariant; the a-priori KLL bound at k=200 is ~1.7%, so 2.5%
    # holds with margin; p99's upper bound clamps to the max).
    sk = l.groupBy("l_returnflag").agg(
        F.expr("kll_sketch_agg_double(l_extendedprice)").alias("sk"),
        F.expr(
            "percentile(l_extendedprice,"
            " array(0.5, 0.9, 0.99,"
            " 0.475, 0.525, 0.875, 0.925, 0.965, 1.0))"
        ).alias("q_all"),
    )
    def _rank_ok(q: float, lo: int, hi: int):
        return (
            F.expr(f"kll_sketch_get_quantile_double(sk, {q})")
            .between(F.element_at("q_all", 3 + lo), F.element_at("q_all", 3 + hi))
        )

    return sk.select(
        "l_returnflag",
        F.round(F.element_at("q_all", 1), 4).alias("exact_p50"),
        F.round(F.element_at("q_all", 2), 4).alias("exact_p90"),
        F.round(F.element_at("q_all", 3), 4).alias("exact_p99"),
        _rank_ok(0.5, 1, 2).alias("p50_rank_ok"),
        _rank_ok(0.9, 3, 4).alias("p90_rank_ok"),
        _rank_ok(0.99, 5, 6).alias("p99_rank_ok"),
    )


@register(
    "q_correlated_subquery",
    oracle="""
    SELECT o.o_custkey,
           COUNT(*) AS n_above_own_avg
    FROM orders o
    WHERE o.o_totalprice > (
        SELECT AVG(i.o_totalprice) FROM orders i
        WHERE i.o_custkey = o.o_custkey
    )
    GROUP BY o.o_custkey
    """,
    doc="Correlated scalar subquery — each order compares against ITS "
    "customer's average. Exercised through spark.sql on a temp view "
    "(the registry's only pure-SQL-surface query): Catalyst de-"
    "correlates the subquery into an aggregate + equi-join on the "
    "correlation key, so what reads as a per-row re-query executes as "
    "one rollup and one hash join — the textbook case for trusting "
    "the optimizer over hand-written RDD loops.",
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o.o_custkey,
               COUNT(*) AS n_above_own_avg
        FROM orders_v o
        WHERE o.o_totalprice > (
            SELECT AVG(i.o_totalprice) FROM orders_v i
            WHERE i.o_custkey = o.o_custkey
        )
        GROUP BY o.o_custkey
        """
    )


@register(
    "q_lateral_topn",
    oracle="""
    SELECT n.n_name, c.c_name, ROUND(c.c_acctbal, 2) AS acctbal
    FROM nation n,
    LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
    ) c
    """,
    doc="Correlated LATERAL subquery with a per-row ORDER BY ... LIMIT — "
    "the 'top-2 customers per nation' shape written as a lateral "
    "derived table instead of a ranking window. Catalyst decorrelates "
    "the limit-bearing subquery into a partitioned rank filter on the "
    "correlation key (DecorrelateInnerQuery), so the apparent "
    "re-query-per-nation executes as ONE pass over customer with a "
    "per-key top-2 — same plan family as q_window_topn, reached from "
    "the opposite syntax. Complements q_udtf_tokens' LATERAL VIEW "
    "(table function) with the correlated-subquery flavor of LATERAL.",
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, ROUND(c.c_acctbal, 2) AS acctbal
        FROM nation_v n
        JOIN LATERAL (
            SELECT c_name, c_acctbal FROM customer_v
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) c
        """
    )


@register(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE chain AS (
        SELECT c_custkey, CAST(0 AS INT) AS depth
        FROM customer WHERE c_custkey = 1
        UNION ALL
        SELECT c.c_custkey, chain.depth + 1
        FROM customer c JOIN chain ON c.c_custkey // 2 = chain.c_custkey
        WHERE c.c_custkey > 1
    )
    SELECT depth,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(c_custkey) AS min_key,
           MAX(c_custkey) AS max_key
    FROM chain GROUP BY depth
    """,
    doc="Recursive CTE (WITH RECURSIVE, Spark 4): transitive closure of "
    "a derived reporting hierarchy (manager = custkey div 2) from the "
    "root, rolled up per depth. Each recursion level is one equi-join "
    "of the frontier against the base table — the frontier is the only "
    "state carried between levels, and termination is the join running "
    "dry (log2(N) levels here). The SQL-native sibling of the "
    "pointer-doubling loop in llm/dedup.py:connected_components; depth "
    "is bounded by spark.sql.cteRecursionLevelLimit.",
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_compactor_spark.llm.text import persist_tracked

    # The recursion step re-executes its whole subtree per level —
    # log2(N) levels, each re-scanning the base table from parquet.
    # Persist the ONE column the recursion reads (released by
    # release_guard_caches like every tracked cache): levels 2..k read
    # the cached long column instead of re-scanning (r14 session 4,
    # interleaved same-JVM A/B x6: median 3.33 -> 2.95 s at sf0.1; at
    # scale the saving is (levels - 1) parquet scans).
    persist_tracked(
        load(spark, sf_dir, "customer").select("c_custkey")
    ).createOrReplaceTempView("customer_rcte")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
            SELECT c_custkey, CAST(0 AS INT) AS depth
            FROM customer_rcte WHERE c_custkey = 1
            UNION ALL
            SELECT c.c_custkey, chain.depth + 1
            FROM customer_rcte c JOIN chain ON c.c_custkey DIV 2 = chain.c_custkey
            WHERE c.c_custkey > 1
        )
        SELECT depth,
               COUNT(*) AS n_members,
               MIN(c_custkey) AS min_key,
               MAX(c_custkey) AS max_key
        FROM chain GROUP BY depth
        """
    )


@register(
    "q_chisq_independence",
    oracle="""
    WITH observed AS (
        SELECT event_type,
               CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS vbucket,
               count(*) AS o
        FROM events
        GROUP BY 1, 2
    ),
    cells AS (
        SELECT t.event_type, b.vbucket, COALESCE(obs.o, 0) AS o
        FROM (SELECT DISTINCT event_type FROM observed) t
        CROSS JOIN (SELECT DISTINCT vbucket FROM observed) b
        LEFT JOIN observed obs
          ON obs.event_type = t.event_type AND obs.vbucket = b.vbucket
    ),
    tot AS (
        SELECT event_type, vbucket, o,
               SUM(o) OVER (PARTITION BY event_type) AS row_tot,
               SUM(o) OVER (PARTITION BY vbucket) AS col_tot,
               SUM(o) OVER () AS n
        FROM cells
    )
    SELECT ROUND(SUM((o - row_tot * col_tot / CAST(n AS DOUBLE))
                     * (o - row_tot * col_tot / CAST(n AS DOUBLE))
                     / (row_tot * col_tot / CAST(n AS DOUBLE))), 4) AS chi2,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT vbucket) - 1) AS INT) AS dof
    FROM tot
    """,
    doc="Chi-squared independence profile between event_type and a "
    "value bucket — the data-quality check a feature pipeline runs to "
    "detect unexpected correlation between a categorical and a "
    "binned measure. One fact-table hash-agg produces the O(types x "
    "buckets) contingency table (10 cells); expected counts and the "
    "chi-squared sum are windows/aggregates over that TINY result, so "
    "the statistic costs one scan regardless of data size. All inputs "
    "to the float math are exact integer counts -> 4dp rounding is "
    "engine-stable (the sum spans 10 cells; fp association error "
    "~1e-15 relative).",
)
def q_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    observed = (
        e.withColumn(
            "vbucket", F.when(F.col("value") >= 50, "high").otherwise("low")
        )
        .groupBy("event_type", "vbucket")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    # Complete the contingency grid: a (type, bucket) cell nobody hit
    # still contributes its expected count to the statistic ((0-E)^2/E
    # = E) — dropping empty cells understates chi2. The grid is a tiny
    # dims-cross-dims broadcast (types x buckets rows), never fact data.
    grid = (
        observed.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(observed.select("vbucket").distinct()))
    )
    cells = grid.join(observed, ["event_type", "vbucket"], "left").select(
        "event_type", "vbucket", F.coalesce("o", F.lit(0)).alias("o")
    )
    row_w = Window.partitionBy("event_type")
    col_w = Window.partitionBy("vbucket")
    all_w = Window.partitionBy()
    with_tot = cells.select(
        "event_type",
        "vbucket",
        "o",
        F.sum("o").over(row_w).alias("row_tot"),
        F.sum("o").over(col_w).alias("col_tot"),
        F.sum("o").over(all_w).alias("n"),
    )
    expected = F.col("row_tot") * F.col("col_tot") / F.col("n").cast("double")
    return with_tot.agg(
        F.round(
            F.sum((F.col("o") - expected) * (F.col("o") - expected) / expected), 4
        ).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("vbucket") - 1)
        ).cast("int").alias("dof"),
    )


@register(
    "q_skew_audit",
    oracle="""
    WITH freq AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS f
        FROM events GROUP BY user_id
    ),
    banded AS (
        SELECT f,
               CAST(CASE WHEN f < 2 THEN 0 WHEN f < 4 THEN 1
                         WHEN f < 8 THEN 2 WHEN f < 16 THEN 3
                         WHEN f < 32 THEN 4 WHEN f < 64 THEN 5
                         WHEN f < 128 THEN 6 WHEN f < 256 THEN 7
                         WHEN f < 512 THEN 8 WHEN f < 1024 THEN 9
                         WHEN f < 4096 THEN 10 WHEN f < 65536 THEN 11
                         ELSE 12 END AS BIGINT) AS band
        FROM freq
    )
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(f) AS BIGINT) AS n_rows,
           CAST(MAX(f) AS BIGINT) AS max_freq,
           CAST((MAX(MAX(f)) OVER () * 1000000)
                // (SUM(SUM(f)) OVER () // SUM(COUNT(*)) OVER ()
                    + CASE WHEN SUM(SUM(f)) OVER ()
                                % SUM(COUNT(*)) OVER () = 0
                           THEN 0 ELSE 1 END) AS BIGINT)
               AS skew_ratio_micro_floor
    FROM banded GROUP BY band ORDER BY band
    """,
    doc="Shuffle-key skew audit over the events join/agg key (user_id) — "
    "the diagnostic that DECIDES when q_salted_join / q_salted_agg's "
    "machinery is worth its extra exchange: the key-frequency table is "
    "banded into power-of-two buckets (exact integer comparisons — no "
    "log() portability risk) and each band reports key count, row "
    "mass, and its hottest key; every row carries the corpus-level "
    "skew ratio max_freq/ceil(avg_freq) in exact integer micro units "
    "(// of BIGINTs on both engines — the q_kanon_audit convention). "
    "A ratio near 1e6 means uniform keys (no salting); 10-100x means "
    "one reducer owns the shuffle and the salted twins should take "
    "over. Plan: ONE hash agg to the key-frequency table (bounded by "
    "distinct keys, not rows), a 13-band rollup, and a bands-sized "
    "window — never a global sort over the frequency table, which is "
    "what makes the audit itself scale-safe (rank-based percentiles "
    "over billions of keys would need the very skew handling this "
    "query is deciding on).",
)
def q_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    freq = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("f"))
    band = (
        F.when(F.col("f") < 2, 0)
        .when(F.col("f") < 4, 1)
        .when(F.col("f") < 8, 2)
        .when(F.col("f") < 16, 3)
        .when(F.col("f") < 32, 4)
        .when(F.col("f") < 64, 5)
        .when(F.col("f") < 128, 6)
        .when(F.col("f") < 256, 7)
        .when(F.col("f") < 512, 8)
        .when(F.col("f") < 1024, 9)
        .when(F.col("f") < 4096, 10)
        .when(F.col("f") < 65536, 11)
        .otherwise(12)
        .cast("bigint")
    )
    g = freq.select(band.alias("band"), "f").groupBy("band").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("f").cast("bigint").alias("n_rows"),
        F.max("f").cast("bigint").alias("max_freq"),
    )
    # Exact integer arithmetic end to end (div, not /: the double
    # quotient loses integer exactness past 2^53 — q_kanon_audit's
    # convention), over a bands-sized window.
    return (
        g.select(
            "band",
            "n_keys",
            "n_rows",
            "max_freq",
            F.expr(
                "CAST((MAX(max_freq) OVER () * 1000000)"
                " div ((SUM(n_rows) OVER ()) div (SUM(n_keys) OVER ())"
                "      + CASE WHEN pmod(SUM(n_rows) OVER (),"
                "                       SUM(n_keys) OVER ()) = 0"
                "             THEN 0 ELSE 1 END) AS BIGINT)"
            ).alias("skew_ratio_micro_floor"),
        )
        .orderBy("band")
    )


#: Count-Min sketch geometry: D independent hash rows x W buckets.
#: eps = e/W ~ 0.53% of the stream per bucket at W=512; delta = e^-D.
CMS_D = 4
CMS_W = 512
CMS_TOPK = 20


@register(
    "q_countmin_topk",
    oracle=f"""
    WITH cms AS (
        SELECT d,
               ('0x' || substr(md5(CAST(d AS VARCHAR) || ':'
                               || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                   % {CMS_W} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events, UNNEST(range({CMS_D})) AS t(d)
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt
        FROM events GROUP BY user_id
        ORDER BY true_cnt DESC, user_id LIMIT {CMS_TOPK}
    ),
    est AS (
        SELECT e.user_id, e.true_cnt,
               MIN(c.cnt) AS est_cnt
        FROM exact e, UNNEST(range({CMS_D})) AS t(d)
        JOIN cms c
          ON c.d = t.d
         AND c.bucket = ('0x' || substr(md5(CAST(t.d AS VARCHAR) || ':'
                         || CAST(e.user_id AS VARCHAR)), 1, 15))::BIGINT
                        % {CMS_W}
        GROUP BY e.user_id, e.true_cnt
    )
    SELECT user_id, true_cnt, CAST(est_cnt AS BIGINT) AS est_cnt,
           CAST(est_cnt - true_cnt AS BIGINT) AS overcount
    FROM est ORDER BY true_cnt DESC, user_id
    """,
    doc="Count-Min sketch heavy-hitter estimation (Cormode & "
    "Muthukrishnan 2005) — the streaming-counts sketch the exact "
    "q_heavy_hitters degrades to when the key space stops fitting "
    "anywhere: D=4 hash rows x W=512 buckets (2048 counters total, "
    "KBs, mergeable by addition across partitions/days exactly like "
    "the HLL rollup), point query = min over the key's D buckets, "
    "one-sided error (never undercounts; overcount <= eN/W w.p. "
    "1-e^-D). Evaluated against the exact top-20 keys with the "
    "OVERCOUNT as a first-class output column. Unlike q_hll_sketch "
    "(JVM-internal sketch bytes, invariant oracle) the hash here is "
    "portable md5 on BOTH engines, so the sketch itself is "
    "hash-compared EXACTLY — the full differential guarantee on a "
    "probabilistic structure. Plan: the sketch build is one "
    "D-way explode + (d, bucket) hash agg into 2048 groups (at 100 TB "
    "this is the canonical map-side-combine shape: partials are "
    "2048-row tables per partition); the probe side is the exact "
    "top-K heap (TakeOrdered) broadcast onto its D buckets. The "
    "deliberate demo pairing: the exact counter needs "
    "O(distinct keys) state, the sketch O(D*W) regardless of keys.",
)
def q_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    ds = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("d")

    def bucket(dcol, keycol):
        return F.conv(
            F.substring(
                F.md5(F.concat(dcol.cast("string"), F.lit(":"), keycol.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint") % CMS_W

    cms = (
        e.select("user_id", ds)
        .select("d", bucket(F.col("d"), F.col("user_id")).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    exact = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), F.col("user_id"))
        .limit(CMS_TOPK)
    )
    probes = exact.select(
        "user_id",
        "true_cnt",
        ds,
    ).select(
        "user_id",
        "true_cnt",
        "d",
        bucket(F.col("d"), F.col("user_id")).alias("bucket"),
    )
    return (
        F.broadcast(probes)
        .join(cms, ["d", "bucket"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("cnt").cast("bigint").alias("est_cnt"))
        .select(
            "user_id",
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("true_cnt")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.col("true_cnt").desc(), "user_id")
    )


# --------------------------------------------------------------------------
# KMV / theta-sketch distinct set operations (union AND intersection)
# --------------------------------------------------------------------------

#: KMV sketch size (k smallest hashes kept per source).
KMV_K = 256

#: The 48-bit portable-hash space (md5-derived). 48, not the simhash
#: convention's 60: every ratio below multiplies a count (<= k) by the
#: denominator before the integer division, and (k-1) * 2^60 overflows
#: int64 while (k-1) * 2^48 = 7.2e16 fits with two decades to spare —
#: exact bigint arithmetic end to end, no DECIMAL/HUGEINT casts. A
#: 48-bit collision needs ~2^24 distinct tokens per source to become
#: likely; the sketch keeps only k=256 of them.
KMV_DENOM = 1 << 48

_KMV_H_SPARK = "cast(conv(substr(md5(tok), 1, 12), 16, 10) as bigint)"
_KMV_H_DUCK = "('0x' || substr(md5(tok), 1, 12))::BIGINT"


@register(
    "q_kmv_intersect",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE text IS NOT NULL
    ),
    h AS (SELECT DISTINCT source, {_KMV_H_DUCK} AS h FROM tok),
    sk AS (
        SELECT source, h,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS r
        FROM h
    ),
    sketch AS (SELECT source, h FROM sk WHERE r <= {KMV_K}),
    st AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sk,
               CASE WHEN COUNT(*) >= {KMV_K} THEN MAX(h)
                    ELSE {KMV_DENOM} END AS theta,
               CASE WHEN COUNT(*) >= {KMV_K}
                    THEN ({KMV_K} - 1) * {KMV_DENOM} // MAX(h)
                    ELSE CAST(COUNT(*) AS BIGINT) END AS est_distinct
        FROM sketch GROUP BY source
    ),
    spine AS (
        SELECT a.source AS src1, b.source AS src2
        FROM st a JOIN st b ON a.source < b.source
    ),
    pu AS (
        SELECT DISTINCT s.src1, s.src2, k.h
        FROM spine s JOIN sketch k
          ON k.source = s.src1 OR k.source = s.src2
    ),
    pur AS (
        SELECT src1, src2, h,
               ROW_NUMBER() OVER (PARTITION BY src1, src2 ORDER BY h) AS r,
               COUNT(*) OVER (PARTITION BY src1, src2) AS n
        FROM pu
    ),
    uest AS (
        SELECT src1, src2,
               CASE WHEN n >= {KMV_K}
                    THEN ({KMV_K} - 1) * {KMV_DENOM} // h
                    ELSE n END AS est_union
        FROM pur WHERE r = LEAST(n, {KMV_K})
    ),
    common AS (
        SELECT s.src1, s.src2,
               LEAST(t1.theta, t2.theta) AS th,
               CAST(COUNT(CASE WHEN a.h IS NOT NULL
                                AND a.h < LEAST(t1.theta, t2.theta)
                          THEN 1 END) AS BIGINT) AS m
        FROM spine s
        JOIN st t1 ON t1.source = s.src1
        JOIN st t2 ON t2.source = s.src2
        LEFT JOIN (
            SELECT k1.source AS src1, k2.source AS src2, k1.h
            FROM sketch k1 JOIN sketch k2
              ON k1.h = k2.h AND k1.source < k2.source
        ) a ON a.src1 = s.src1 AND a.src2 = s.src2
        GROUP BY s.src1, s.src2, t1.theta, t2.theta
    )
    SELECT c.src1, c.src2,
           t1.est_distinct AS est_d1,
           t2.est_distinct AS est_d2,
           u.est_union,
           c.m AS common_below_theta,
           c.m * {KMV_DENOM} // c.th AS est_inter
    FROM common c
    JOIN st t1 ON t1.source = c.src1
    JOIN st t2 ON t2.source = c.src2
    JOIN uest u ON u.src1 = c.src1 AND u.src2 = c.src2
    """,
    doc="KMV / theta-sketch distinct-set algebra over per-source token "
    "vocabularies: UNION and — the operation HLL fundamentally cannot "
    "do — INTERSECTION cardinality, per ordered source pair, in exact "
    "integer arithmetic. Each source keeps its k=256 smallest 48-bit "
    "md5 token hashes; distinct estimate (k-1)*2^48 div h_k (exact "
    "count when the vocabulary is smaller than k); union from the "
    "combined sketch's k-th smallest; intersection via the theta rule "
    "(theta = min of the pair's thetas, m = shared hashes below theta, "
    "est = m*2^48 div theta — collapsing to the exact m when both "
    "sketches are exhaustive). Every quantity is a bigint (no float "
    "estimator drift), so the DuckDB oracle replays the sketch "
    "bit-for-bit — the q_countmin_topk full-differential discipline "
    "extended to the set-operation sketch family. At 100 TB: sketch "
    "build is one distinct + one per-source top-k window (O(sources x "
    "k) rows out); all pair math runs on sketch rows only (20 x 20 "
    "pairs x 256 rows), never on the corpus.",
)
def q_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select(
        "source", F.explode(F.split("text", " ", -1)).alias("tok")
    ).select("source", F.expr(_KMV_H_SPARK).alias("h")).distinct()
    w = Window.partitionBy("source").orderBy("h")
    sketch = (
        tok.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= KMV_K)
        .select("source", "h")
    )
    # persist: the sketch feeds the per-source stats, both spine sides,
    # the union ranking and the common-hash join (5 consumers).
    from parquet_compactor_spark.llm.text import persist_tracked

    sketch = persist_tracked(sketch)
    st = sketch.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sk"),
        F.max("h").alias("h_max"),
    ).select(
        "source",
        "n_sk",
        F.when(F.col("n_sk") >= KMV_K, F.col("h_max"))
        .otherwise(F.lit(KMV_DENOM))
        .alias("theta"),
        F.when(
            F.col("n_sk") >= KMV_K,
            F.expr(f"CAST(({KMV_K} - 1) * {KMV_DENOM} div h_max AS BIGINT)"),
        )
        .otherwise(F.col("n_sk"))
        .alias("est_distinct"),
    )
    t1 = st.select(
        F.col("source").alias("src1"),
        F.col("theta").alias("theta1"),
        F.col("est_distinct").alias("est_d1"),
    )
    t2 = st.select(
        F.col("source").alias("src2"),
        F.col("theta").alias("theta2"),
        F.col("est_distinct").alias("est_d2"),
    )
    spine = t1.crossJoin(t2).filter(F.col("src1") < F.col("src2"))
    e1 = sketch.select(F.col("source").alias("src1"), "h")
    e2 = sketch.select(F.col("source").alias("src2"), "h")
    # Every join below is between sketch-BOUNDED tables (<= K rows per
    # source / source-pair rows — model state at any corpus size), but
    # the planner saw SortMergeJoins for four of them (sketch size
    # estimates arrive too late for the initial plan). Broadcast the
    # smaller, strictly-bounded side explicitly: 4 SMJ -> 0, four
    # sort+exchange pairs gone (r15; guide §3.1 — the broadcast side is
    # bounded BY CONSTRUCTION, so this is scale-safe, unlike
    # corpus-shaped broadcasts).
    pu = (
        spine.select("src1", "src2")
        .join(F.broadcast(e1), "src1")
        .select("src1", "src2", "h")
        .unionByName(
            spine.select("src1", "src2")
            .join(F.broadcast(e2), "src2")
            .select("src1", "src2", "h")
        )
        .distinct()
    )
    wp = Window.partitionBy("src1", "src2").orderBy("h")
    wn = Window.partitionBy("src1", "src2")
    uest = (
        pu.withColumn("r", F.row_number().over(wp))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.col("r") == F.least(F.col("n"), F.lit(KMV_K)))
        .select(
            "src1",
            "src2",
            F.when(
                F.col("n") >= KMV_K,
                F.expr(f"CAST(({KMV_K} - 1) * {KMV_DENOM} div h AS BIGINT)"),
            )
            .otherwise(F.col("n").cast("bigint"))
            .alias("est_union"),
        )
    )
    shared = (
        e1.join(F.broadcast(e2), "h")
        .filter(F.col("src1") < F.col("src2"))
        .select("src1", "src2", "h")
    )
    common = (
        spine.join(F.broadcast(shared), ["src1", "src2"], "left")
        .select(
            "src1",
            "src2",
            "theta1",
            "theta2",
            "est_d1",
            "est_d2",
            F.least("theta1", "theta2").alias("th"),
            "h",
        )
        .groupBy("src1", "src2", "th", "est_d1", "est_d2")
        .agg(
            F.sum(
                F.when(
                    F.col("h").isNotNull() & (F.col("h") < F.col("th")), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("m")
        )
    )
    return common.join(F.broadcast(uest), ["src1", "src2"]).select(
        "src1",
        "src2",
        "est_d1",
        "est_d2",
        "est_union",
        F.col("m").alias("common_below_theta"),
        F.expr(f"CAST(m * {KMV_DENOM} div th AS BIGINT)").alias("est_inter"),
    )
