"""Reusable column functions and plan utilities (skew handling, as-of,
ride-along data-quality observation)."""

from parquet_compactor_spark.functions.asof import asof_join
from parquet_compactor_spark.functions.quality import (
    observed_metrics,
    quality_aggs,
    with_quality_metrics,
)
from parquet_compactor_spark.functions.skew import salted_aggregate, salted_join

__all__ = [
    "asof_join",
    "observed_metrics",
    "quality_aggs",
    "salted_aggregate",
    "salted_join",
    "with_quality_metrics",
]
