"""Reusable column functions and plan utilities (skew handling, vectors)."""

from parquet_compactor_spark.functions.skew import salted_aggregate, salted_join

__all__ = ["salted_aggregate", "salted_join"]
