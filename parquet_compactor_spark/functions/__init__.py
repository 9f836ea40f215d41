"""Reusable column functions and plan utilities (skew handling, as-of)."""

from parquet_compactor_spark.functions.asof import asof_join
from parquet_compactor_spark.functions.skew import salted_aggregate, salted_join

__all__ = ["asof_join", "salted_aggregate", "salted_join"]
