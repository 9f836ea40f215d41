"""Query registry: the single source of truth for the engine's query surface.

Every operator from SURVEY.md §2B registers here as a named query — a
PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where expressible)
an equivalent ANSI-SQL string for the DuckDB oracle. ``__spark_entry__.py``
exposes this registry to the driver's differential harness.

Conventions enforced here by construction:
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver hashes after sorting columns by name);
- float outputs are rounded in BOTH engines (summation-order tolerance);
- timestamps in outputs are truncated/formatted identically on both sides
  (events.ts is parquet ns; Spark reads micros, DuckDB keeps ns).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver records a weaker rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one driver-provided parquet table (TESTDATA.md).

    ``events.ts`` has shipped in two fixture generations: parquet
    TIMESTAMP(NANOS) (read as long via
    ``spark.sql.legacy.parquet.nanosAsLong`` and converted to a
    microsecond timestamp) and naive TIMESTAMP(MICROS)
    (``isAdjustedToUTC=false``, which Spark 4 infers as TIMESTAMP_NTZ).
    Both normalize here to a plain TIMESTAMP so downstream operators
    (``unix_micros``, range frames, watermarks) see one type. The
    NTZ→TIMESTAMP cast is wall-clock-preserving in the session zone, so
    collected/rendered values are identical to DuckDB's naive read
    regardless of the caller's timezone.
    """
    if table == "events":
        # Works on any caller-provided SparkSession (the driver builds its
        # own): enable nanos-as-long at runtime before reading.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _ensure_loaded() -> None:
    # Import side effect: all query modules register themselves.
    from parquet_compactor_spark import llm, queries, streaming  # noqa: F401


# Queries listed here are yielded FIRST by all_queries(), in this order.
# External differential harnesses that sample a prefix of the registry
# (the driver checks the first 50 entries) therefore verify these before
# anything else. Round 4 (exactly 50 names):
#   1-10  the 10 round-3 additions — never driver-checked;
#   11    q_embed_quantize — r3 driver row errored on its array<bigint>
#         output (pandas canonicalizer crash); output is now a scalar
#         string, must stay in the window until driver-green;
#   12-13 q_hll_sketch (reshaped this round: exact counts + tolerance
#         invariant under an oracle) and its new rows-only twin
#         q_hll_sketch_state;
#   14-23 the 10 round-4 TPC-H completions (queries/tpch_extra.py) —
#         every registered query should have a driver row after this
#         round, so first-time checks outrank re-verification;
#   24-25 the two other round-4 additions: q_merge_upsert (batch CDC
#         MERGE) and q_lateral_topn (correlated LATERAL with LIMIT);
#   26-46 21 of the 33 queries whose latest driver row is round 1 —
#         oldest evidence, re-verified against silent regression, with
#         the LLM dedup/ANN family and plan-sensitive ops kept over the
#         12 simplest / weakest-value re-checks (q_cross_join, q_having,
#         q_in_subquery, q_null_handling, q_rlike_filter, q_string_fns,
#         q_union_all, q_unpivot, q_window_first_last, q_window_ranks,
#         q_approx_stats (rows-only), q_arg_extremes — r1-green,
#         untouched since, next in line);
#   47-50 four round-2 greens with complex-type-heavy internals,
#         re-checked after this round's scalar-output sweep.
# Everything not listed follows in registration order.
#
# Round-5 rotation plan: with full first-time coverage after this round,
# refill the window oldest-first: the 12 r1-greens named above, then the
# round-2 cohort (44), then the oldest round-3 rows.
_PRIORITY: tuple[str, ...] = (
    # -- 10 round-3 additions, never driver-checked --
    "q_funnel_steps",
    "q_retention_cohorts",
    "q_salted_join",
    "q_promo_revenue",
    "q_nation_revenue",
    "q_batch_sim_topk",
    "q_recursive_cte",
    "q_variant_props",
    "q_heavy_hitters",
    "q_kll_quantiles",
    # -- r3 driver defect, output shape fixed this round --
    "q_embed_quantize",
    # -- reshaped sketch pair (oracle split this round) --
    "q_hll_sketch",
    "q_hll_sketch_state",
    # -- 10 round-4 TPC-H completions, never driver-checked --
    "q_order_priority",
    "q_volume_shipping",
    "q_market_share",
    "q_returned_items",
    "q_cust_order_dist",
    "q_top_supplier",
    "q_small_qty_revenue",
    "q_large_orders",
    "q_disjunctive_join",
    "q_idle_customers",
    # -- 2 other round-4 additions, never driver-checked --
    "q_merge_upsert",
    "q_lateral_topn",
    # -- 21 round-1-only greens: oldest driver evidence --
    "q_ann_ivf",
    "q_ann_lsh",
    "q_array_agg",
    "q_conditional_distinct",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_doc_chunking",
    "q_dup_clusters",
    "q_embed_near_dup",
    "q_explode_posexplode",
    "q_fingerprint",
    "q_frame_sample",
    "q_kmeans_clusters",
    "q_lang_id",
    "q_median_filtered",
    "q_ngram_jaccard",
    "q_quality_score",
    "q_regr_slope",
    "q_sim_topk",
    "q_tfidf_topterms",
    # -- 4 round-2 greens, complex-type-adjacent, post-sweep re-check --
    "q_array_fns",
    "q_higher_order_fns",
    "q_json_props",
    "q_map_props",
)


def all_queries() -> dict[str, Query]:
    _ensure_loaded()
    ordered: dict[str, Query] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
