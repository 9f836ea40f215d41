"""Differential tests: every registered query vs its DuckDB oracle.

This mirrors the driver's t2 correctness gate (at sf0.001 for speed; the
driver runs sf0.01). Queries without an oracle get a rows-run smoke check.
"""

from __future__ import annotations

import pytest

from parquet_compactor_spark.registry import TABLES, all_queries
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare_to_oracle, duck_connection

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_SMOKE)
    if q.oracle is None:
        # Rows-only check (mirrors the driver's weaker gate).
        assert df.count() >= 0
    else:
        compare_to_oracle(df, q.oracle, SF_SMOKE)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(entry_mod.queries()) >= set(entry_mod.oracle_sql())


def test_hll_sketch_within_tolerance(spark):
    """HLL default lgK=12 gives ~1.6% standard error; every group's derived
    invariants (estimate within 5% of exact; split-and-union estimate equal
    to whole-corpus estimate) must hold."""
    rows = QUERIES["q_hll_sketch_state"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.within_tol, (r.event_type, r.exact_users)
        assert r.merge_consistent, r.event_type


def test_hll_sketch_bytes_round_trip_storage(spark, tmp_path):
    """The binary sketch column survives a parquet write/read and still
    union-merges to the same estimate — the property that lets daily
    sketches roll up into monthly cardinalities without rescanning."""
    from pyspark.sql import functions as F

    from parquet_compactor_spark.registry import load

    e = load(spark, SF_SMOKE, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    path = str(tmp_path / "daily_sketches")
    daily.write.parquet(path)
    merged_est = (
        spark.read.parquet(path)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    whole_est = (
        e.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()[0]
        .est
    )
    assert merged_est == whole_est


def test_hll_sketches_merge_across_partitions(spark):
    """The sketch column is mergeable state: sketches built on disjoint
    halves union to the same estimate as one pass over the whole."""
    from pyspark.sql import functions as F

    from parquet_compactor_spark.registry import load

    e = load(spark, SF_SMOKE, "events")
    whole = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0].est
    halves = (
        e.withColumn("half", (F.col("event_id") % 2).cast("int"))
        .groupBy("half")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    assert whole == halves


def test_heavy_hitters_exact_at_small_cardinality(spark):
    """With maxItemsTracked (default 10k) >= true cardinality (150 users),
    approx_top_k counts are exact: every reported (type, user, count) must
    equal the exact groupBy count, and each type's reported users must be
    a top-5-by-count set (ties at the boundary make the cut order free)."""
    from pyspark.sql import functions as F

    from parquet_compactor_spark.registry import load

    got = QUERIES["q_heavy_hitters"].fn(spark, SF_SMOKE).collect()
    assert got
    e = load(spark, SF_SMOKE, "events")
    exact = {
        (r.event_type, r.user_id): r["count"]
        for r in e.groupBy("event_type", "user_id").count().collect()
    }
    for r in got:
        # Every reported sketch count equals the item's exact count.
        assert r.counts_exact, r.event_type
        # The 5 reported counts are the 5 largest exact counts.
        type_counts = sorted(
            (v for (t, _), v in exact.items() if t == r.event_type), reverse=True
        )
        assert r.top_counts == ",".join(str(c) for c in type_counts[:5]), (
            r.event_type
        )


def test_heavy_hitter_sketches_merge_across_partitions(spark):
    """approx_top_k state is mergeable: accumulate per half, combine,
    estimate == a single-pass estimate (same items and counts)."""
    from pyspark.sql import functions as F

    from parquet_compactor_spark.registry import load

    e = load(spark, SF_SMOKE, "events")
    whole = (
        e.agg(F.expr("approx_top_k(user_id, 10)").alias("top"))
        .select(F.explode("top").alias("hh"))
        .select("hh.item", "hh.count")
        .collect()
    )
    halves = (
        e.withColumn("half", (F.col("event_id") % 2).cast("int"))
        .groupBy("half")
        .agg(F.expr("approx_top_k_accumulate(user_id)").alias("acc"))
        .agg(F.expr("approx_top_k_estimate(approx_top_k_combine(acc), 10)").alias("top"))
        .select(F.explode("top").alias("hh"))
        .select("hh.item", "hh.count")
        .collect()
    )
    assert {(r.item, r["count"]) for r in whole} == {
        (r.item, r["count"]) for r in halves
    }


def test_kll_quantiles_within_rank_error(spark):
    """KLL at default k guarantees ~1.7% rank error; assert each sketch
    quantile's EXACT rank is within 3% of the requested rank (stronger
    than the query's +/-2.5% value-bound booleans, computed on raw data)."""
    import bisect

    from pyspark.sql import functions as F

    from parquet_compactor_spark.registry import load

    rows = QUERIES["q_kll_quantiles"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.p50_rank_ok and r.p90_rank_ok and r.p99_rank_ok, r.l_returnflag

    l = load(spark, SF_SMOKE, "lineitem")
    sk = (
        l.groupBy("l_returnflag")
        .agg(F.expr("kll_sketch_agg_double(l_extendedprice)").alias("sk"))
        .select(
            "l_returnflag",
            *[
                F.expr(f"kll_sketch_get_quantile_double(sk, {q})").alias(f"q{i}")
                for i, q in enumerate((0.5, 0.9, 0.99))
            ],
        )
        .collect()
    )
    for r in sk:
        vals = sorted(
            x.l_extendedprice
            for x in l.filter(F.col("l_returnflag") == r.l_returnflag)
            .select("l_extendedprice")
            .collect()
        )
        n = len(vals)
        for q, est in [(0.5, r.q0), (0.9, r.q1), (0.99, r.q2)]:
            rank = bisect.bisect_right(vals, est) / n
            assert abs(rank - q) <= 0.03, (r.l_returnflag, q, est, rank)


def test_kll_sketches_merge_across_partitions(spark):
    """KLL sketches built on disjoint halves merge to the same quantile
    estimates as one pass over the whole."""
    from pyspark.sql import functions as F

    from parquet_compactor_spark.registry import load

    l = load(spark, SF_SMOKE, "lineitem")
    whole = l.agg(
        F.expr(
            "kll_sketch_get_quantile_double(kll_sketch_agg_double(l_extendedprice), 0.9)"
        ).alias("p90")
    ).collect()[0].p90
    halves = (
        l.withColumn("half", (F.col("l_orderkey") % 2).cast("int"))
        .groupBy("half")
        .agg(F.expr("kll_sketch_agg_double(l_extendedprice)").alias("sk"))
        .agg(F.collect_list("sk").alias("sks"))
        # kll_sketch_merge_double is a binary scalar merge: fold the
        # per-half sketches with a higher-order reduce.
        .select(
            F.expr(
                "kll_sketch_get_quantile_double("
                "  reduce(slice(sks, 2, size(sks) - 1), sks[0],"
                "         (acc, x) -> kll_sketch_merge_double(acc, x)),"
                "  0.9)"
            ).alias("p90")
        )
        .collect()[0]
        .p90
    )
    # Merge is lossless for the k=200 default at this input size.
    assert abs(whole - halves) / whole < 0.02


def test_approx_stats_p50_within_exact_rank_bound(spark):
    """Test-only twin of q_approx_stats' rank-error check (round 8).

    The registered query's ``p50_within_rank`` is a digest
    self-consistency invariant (one t-digest queried at 0.45/0.5/0.55 is
    monotone by construction) so its sketch pass stays literally
    constant-memory. The STATISTICAL claim — the t-digest's p50 estimate
    lands between the EXACT 0.45 and 0.55 quantiles (the documented
    rank-error bound at default accuracy 10000) — needs an exact
    per-group percentile, i.e. a full value buffer, so it lives here in
    test scope instead of the 100 TB plan.
    """
    from pyspark.sql import functions as F

    from parquet_compactor_spark.registry import load

    l = load(spark, SF_SMOKE, "lineitem")
    rows = (
        l.groupBy("l_returnflag")
        .agg(
            F.expr("approx_percentile(l_extendedprice, 0.5)").alias("ap50"),
            F.expr(
                "percentile(l_extendedprice, array(0.45, 0.55))"
            ).alias("rb"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert r.rb[0] <= r.ap50 <= r.rb[1], (
            f"group {r.l_returnflag}: approx p50 {r.ap50} outside exact "
            f"rank bound {r.rb}"
        )


def test_oracle_outputs_are_scalar_only(spark):
    """Registry convention: no oracle-bearing query emits a complex-typed
    (array/map/struct) output column.

    The driver's differential harness canonicalizes results with pandas
    ``sort_values`` over ALL columns; list-typed cells are unhashable there
    and crash the comparison (observed: q_embed_quantize, CORRECTNESS_r03).
    Our local canonicalizer stringifies lists, so only this schema-level
    test catches the hazard before the driver does. Queries needing array
    results render them as strings (``concat_ws`` / ``array_to_string``).

    Round-6 extension: bare TIMESTAMP output columns are banned too. The
    collected rendering of an LTZ timestamp is session-dependent (an
    LTZ-inferring harness collects the instant, not the wall clock —
    reproduced: the hostile-conf sweep flipped q_large_orders and
    q_event_attribution by the session-zone offset). Queries render
    timestamps as DATE or as wall-clock-formatted strings instead.
    """
    offenders = {}
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue  # rows-only checks never reach the canonicalizer
        df = q.fn(spark, SF_SMOKE)
        bad_cols = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if f.dataType.simpleString().startswith(("array", "map", "struct"))
            or f.dataType.simpleString() in ("timestamp", "timestamp_ntz")
        ]
        if bad_cols:
            offenders[name] = bad_cols
    assert not offenders, f"complex- or timestamp-typed oracle outputs: {offenders}"


def test_oracle_output_types_are_hash_stable():
    """DuckDB-side output-TYPE lint over every registered oracle (round 8;
    sibling of the bare-TIMESTAMP ban above, but on the ORACLE's side).

    The driver's hasher is representation-sensitive: a DuckDB column whose
    type differs from Spark's hashes differently even when every value is
    identical. Reproduced in round 7: ``q_lang_temperature``'s
    ``BIGINT // SUM(BIGINT) OVER ()`` divisions came back HUGEINT (DuckDB
    types a windowed SUM of BIGINT as HUGEINT), the driver went
    hash-red, and the local harness — which compares Python ints — stayed
    green. Values matched tuple-for-tuple; only the type diverged.

    Allowed types are exactly those the 175 historically driver-green
    oracles emit: BIGINT, INTEGER, DOUBLE, VARCHAR, DATE, BOOLEAN.
    Anything else (HUGEINT, DECIMAL, FLOAT, TIMESTAMP, UINTEGER, ...)
    must be CAST in the oracle SQL before it ships.
    """
    allowed = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE", "BOOLEAN"}
    offenders = {}
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        con = duck_connection(SF_SMOKE)
        try:
            rel = con.sql(q.oracle)
            bad = [
                (c, str(t))
                for c, t in zip(rel.columns, rel.types)
                if str(t) not in allowed
            ]
        finally:
            con.close()
        if bad:
            offenders[name] = bad
    assert not offenders, f"hash-unstable oracle output types: {offenders}"


def test_every_registered_query_has_an_oracle():
    """Milestone guard: the registry carries ZERO rows-only queries.

    Every query — including the iterative ones (k-means replays its
    fixed-iteration Lloyd loop as an unrolled CTE chain, connected
    components is verified through q_dup_clusters) — now ships an ANSI-SQL
    differential oracle. A new query landing without one should be a
    deliberate, visible decision, not an accident: update this test's
    docstring with the justification if that ever happens.
    """
    missing = [n for n, q in QUERIES.items() if q.oracle is None]
    assert missing == []


def test_priority_window_is_exactly_the_driver_sample_size():
    """The external driver verifies the FIRST 50 registry entries per
    round; the rotation only works if _PRIORITY stays exactly 50 valid
    names and all_queries() yields them first, in order."""
    from parquet_compactor_spark.registry import _PRIORITY, all_queries

    qs = all_queries()
    assert len(_PRIORITY) == 50
    missing = [n for n in _PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names not registered: {missing}"
    assert list(qs)[:50] == list(_PRIORITY)
    assert len(set(_PRIORITY)) == 50  # no duplicates silently shrinking the window


# ---------------------------------------------------------------------------
# registry.load / load_ntz session-conf discipline (round-6: VERDICT r5 #1/#6)
# ---------------------------------------------------------------------------

_NANOS_KEY = "spark.sql.legacy.parquet.nanosAsLong"


def test_load_micros_leaves_session_conf_untouched(spark):
    """``registry.load`` must not set the legacy nanosAsLong conf when the
    events footer carries TIMESTAMP(MICROS) — the conf is a persistent
    session mutation that would alter unrelated nanos-parquet reads later
    in the caller's session (VERDICT r5 'What's wrong' #3)."""
    from parquet_compactor_spark.registry import load
    from tests.conftest import SF_CORRECT

    spark.conf.unset(_NANOS_KEY)
    df = load(spark, SF_CORRECT, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert spark.conf.get(_NANOS_KEY) == "false"  # engine default, not ours


def test_load_nanos_fixture_still_sets_conf_and_reads(spark, tmp_path):
    """When the footer DOES carry TIMESTAMP(NANOS) the conf must be set
    (and stay set — Spark re-reads it at execution, so restoring between
    read and action would break the lazy plan) and the read normalize to
    a plain microsecond TIMESTAMP."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_compactor_spark.registry import load

    ts = pa.array(
        [datetime.datetime(2024, 1, 1, 0, 0, i) for i in range(5)],
        type=pa.timestamp("ns"),
    )
    table = pa.table({"ts": ts, "value": pa.array([float(i) for i in range(5)])})
    d = tmp_path / "sfnanos"
    d.mkdir()
    pq.write_table(table, d / "events.parquet")
    spark.conf.unset(_NANOS_KEY)
    try:
        df = load(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.count() == 5
        assert spark.conf.get(_NANOS_KEY) == "true"
    finally:
        spark.conf.unset(_NANOS_KEY)


def test_null_bearing_fixture_matches_oracle(spark, tmp_path):
    """The driver HAS regenerated fixtures between rounds; the current
    ones happen to be null-free. The queries whose constructions have
    engine-divergent NULL semantics (Spark collect_list drops NULLs,
    DuckDB window list()/COUNT(*) keep them) pin their discipline
    explicitly on both sides — prove they agree on a fixture where NULLs
    actually occur, including a group with an even non-null count (the
    interpolating case). This fixture also caught the Spark-round class:
    Spark round() rounds the double's shortest decimal repr half-up
    while DuckDB rounds the binary value, splitting folds that land on
    x.xxxx5 — q_ewma uses floor-form rounding for bit-identity."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    import datetime as _dt

    d = tmp_path / "sfnull"
    d.mkdir()
    # 3 groups: odd count, even count (interpolation), and NULL-heavy.
    types, values = [], []
    for i in range(7):
        types.append("click"); values.append(float(i) if i % 3 else None)
    for i in range(8):
        types.append("view"); values.append(round(i * 1.25, 2))
    for i in range(5):
        types.append("error"); values.append(None if i < 4 else 42.0)
    n = len(values)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), type=pa.int64()),
                "user_id": pa.array([i % 3 for i in range(n)], type=pa.int64()),
                "ts": pa.array(
                    [_dt.datetime(2024, 1, 1) + _dt.timedelta(minutes=i) for i in range(n)],
                    type=pa.timestamp("us"),
                ),
                "event_type": pa.array(types),
                "value": pa.array(values),
            }
        ),
        d / "events.parquet",
    )
    for t in TABLES:  # oracle view registration needs every table present
        if t != "events":
            os.symlink(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    for name in ("q_mad_outliers", "q_ewma"):
        q = QUERIES[name]
        compare_to_oracle(q.fn(spark, str(d)), q.oracle, str(d))


def test_load_ntz_forces_ntz_regardless_of_session_confs(spark):
    """``load_ntz`` pins naive parquet timestamps to TIMESTAMP_NTZ via an
    explicit read schema, so LTZ inference (inferTimestampNTZ=false) in
    the caller's session cannot change the values a query sees."""
    from parquet_compactor_spark.registry import load_ntz
    from tests.conftest import SF_CORRECT

    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    try:
        df = load_ntz(spark, SF_CORRECT, "lineitem")
        assert dict(df.dtypes)["l_shipdate"] == "timestamp_ntz"
    finally:
        spark.conf.unset("spark.sql.parquet.inferTimestampNTZ.enabled")


def test_load_memo_does_not_leak_timezone_across_conf_flips(spark):
    """The load() lazy-plan memo keys on the analysis-time confs: a plan
    memoized under UTC carries timeZoneId=UTC inside its NTZ→TIMESTAMP
    cast, and splicing it into a query whose OTHER date expressions are
    analyzed under a different session zone mixes two zones in one plan
    (q_large_orders' to_date shifted a day: found when the r14 memo
    landed without the conf key). Memoize under the default zone first,
    flip the zone, and the query must still match the oracle."""
    q = QUERIES["q_large_orders"]
    q.fn(spark, SF_SMOKE).collect()  # memoize loads under default confs
    prior = spark.conf.get("spark.sql.session.timeZone", None)
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        compare_to_oracle(q.fn(spark, SF_SMOKE), q.oracle, SF_SMOKE)
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.session.timeZone")
        else:
            spark.conf.set("spark.sql.session.timeZone", prior)


def test_former_driver_reds_survive_hostile_session(spark):
    """Round-5's two driver hash-reds (q_late_line_priority, q_winsorize)
    were local-green: the divergence class is session-level — LTZ
    timestamp inference plus a DST timezone turns `ts + INTERVAL 60 DAYS`
    into duration arithmetic (reproduced locally: the old Q12 predicate
    matched 3048 rows under NTZ/UTC but 3044 under LTZ+America/New_York).
    The date-proof / rank-based rewrites must match the oracle byte-for-
    byte even under those hostile confs."""
    hostile = {
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        "spark.sql.session.timeZone": "America/New_York",
        # LEGACY flips sub-second date_format semantics: SimpleDateFormat
        # SSSSSS is zero-padded MILLIS, not fraction (flipped
        # q_event_attribution's rendering until it switched to
        # unix_micros + format_string).
        "spark.sql.legacy.timeParserPolicy": "LEGACY",
    }
    prior = {k: spark.conf.get(k, None) for k in hostile}
    try:
        for k, v in hostile.items():
            spark.conf.set(k, v)
        for name in ("q_late_line_priority", "q_winsorize", "q_waiting_suppliers",
                     "q_date_arithmetic", "q_equidepth_hist", "q_mad_outliers",
                     # round-6 hostile-sweep finds: bare TIMESTAMP output
                     # columns render session-dependently on collect —
                     # hardened to DATE / wall-clock-string outputs.
                     "q_large_orders", "q_event_attribution"):
            q = QUERIES[name]
            compare_to_oracle(q.fn(spark, SF_SMOKE), q.oracle, SF_SMOKE)
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
