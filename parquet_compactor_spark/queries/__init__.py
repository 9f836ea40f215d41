"""Relational query surface (SURVEY.md §2B).

Importing this package registers all relational queries with the registry.
"""

from parquet_compactor_spark.queries import advanced, relational, scalar_fns  # noqa: F401
