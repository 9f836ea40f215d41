"""parquet_compactor_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference batch ETL job
(project-koku/parquet-compactor, see /root/reference) Spark-first:

- a compaction core (``parquet_compactor_spark.compactor``) that reproduces
  the reference's file-compaction semantics (skip rules, incremental
  idempotence, GCP date grouping) on top of DataFrame reads/writes, and
- an analytics/query surface (``parquet_compactor_spark.queries`` and
  ``parquet_compactor_spark.llm``) of DataFrame-native operators, each
  registered with a DuckDB oracle for differential correctness checking.

Everything is DataFrame/Catalyst-first: declarative plans, predicate
pushdown, broadcast joins, AQE. Python UDFs only where built-ins cannot
express the semantics (and then Arrow-batched).
"""

__version__ = "0.1.0"
