"""Differential tests: every registered query vs its DuckDB oracle.

This mirrors the driver's t2 correctness gate (at sf0.001 for speed; the
driver runs sf0.01). Queries without an oracle get a rows-run smoke check.
"""

from __future__ import annotations

import pytest

from parquet_compactor_spark.registry import all_queries
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare_to_oracle

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
    """HLL default lgK=12 gives ~1.6% standard error; assert every group's
    estimate lands within 5% of the exact distinct count."""
    rows = QUERIES["q_hll_sketch"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.rel_err <= 0.05, (r.event_type, r.approx_users, r.exact_users)


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
