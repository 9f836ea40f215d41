"""Structured Streaming pipelines (file-source ingestion, windowed aggs).

The batch-equivalent query surface lives in queries/scalar_fns.py
(q_tumbling_window); this package holds the readStream/writeStream
pipelines, exercised in tests with availableNow triggers.
"""

from parquet_compactor_spark.streaming import pipeline  # noqa: F401
