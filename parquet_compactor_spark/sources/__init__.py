"""Sources and sinks: format-agnostic table IO with output-size control."""

from parquet_compactor_spark.sources.io import (
    read_binary_files,
    read_table,
    sized_writer,
    write_clustered,
    write_table,
)

__all__ = [
    "read_binary_files",
    "read_table",
    "write_table",
    "write_clustered",
    "sized_writer",
]
