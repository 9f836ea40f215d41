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
