"""Sources and sinks: format-agnostic table IO with output-size control."""

from parquet_compactor_spark.sources.io import (
    read_table,
    sized_writer,
    write_table,
)

__all__ = ["read_table", "write_table", "sized_writer"]
