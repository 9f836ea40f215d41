"""Relational query surface (SURVEY.md §2B).

Importing this package registers all relational queries with the registry.
"""

from parquet_compactor_spark.queries import (  # noqa: F401
    advanced,
    behavior,
    extras,
    relational,
    scalar_fns,
    timeseries,
    tpch_extra,
    tpch_final,
    udx,
)
