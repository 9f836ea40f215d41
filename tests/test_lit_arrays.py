"""lit_double_array / lit_long_array: the one-round-trip literal builders
must produce exactly the values of the per-element ``F.array(*[F.lit(x)])``
form they replaced (r14 construction-cost optimization)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from parquet_compactor_spark.llm.text import lit_double_array, lit_long_array


def _one_row(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_lit_double_array_bit_identical(spark):
    vals = [
        0.0,
        -0.0,
        1.0,
        -1.5,
        0.1,  # not exactly representable — repr round-trip must hold
        1e-300,
        -1e22,
        123456.789012345,
        2.2250738585072014e-308,  # smallest normal
        1.7976931348623157e308,  # largest finite
        5e-324,  # smallest subnormal
    ]
    got = _one_row(spark, lit_double_array(vals))
    ref = _one_row(spark, F.array(*[F.lit(float(v)) for v in vals]))
    assert len(got) == len(vals)
    for g, r, v in zip(got, ref, vals):
        # Bit-level identity, not ==: distinguishes -0.0 from 0.0.
        assert math.copysign(1.0, g) == math.copysign(1.0, r)
        assert g == r == v


def test_lit_double_array_empty_and_nonfinite(spark):
    assert _one_row(spark, lit_double_array([])) == []
    vals = [1.0, float("inf"), float("-inf"), float("nan")]
    got = _one_row(spark, lit_double_array(vals))
    assert got[0] == 1.0
    assert got[1] == float("inf") and got[2] == float("-inf")
    assert math.isnan(got[3])


def test_lit_long_array_bit_identical(spark):
    vals = [0, 1, -1, 2**40, -(2**40), 2**63 - 1, -(2**63)]
    got = _one_row(spark, lit_long_array(vals))
    ref = _one_row(spark, F.array(*[F.lit(v).cast("bigint") for v in vals]))
    assert got == ref == vals


def test_lit_long_array_empty(spark):
    assert _one_row(spark, lit_long_array([])) == []
