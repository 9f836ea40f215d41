"""Compaction core: the reference's file-compaction semantics on Spark.

Reference: /root/reference/parquet-compactor/parquet_compactor.py (a
single-process pandas/boto3 ETL). Here the same semantics are re-expressed
Spark-first: listing via Hadoop FileSystem (works on file://, hdfs://,
s3a://), merging via DataFrame read→repartition→write, deletes via the
same FileSystem handle — so one code path runs locally in tests and on a
real cluster against an object store.
"""

from parquet_compactor_spark.compactor.core import (
    CompactionConfig,
    FileMeta,
    LakeCompactor,
    determine_base_file_name,
    filter_compacted,
    filter_compacted_gcp,
    should_skip_compacting,
)
from parquet_compactor_spark.compactor.report import (
    lake_report,
    rowgroup_report,
    scan_parquet_footers,
    scan_parquet_schemas,
    schema_drift_report,
)

__all__ = [
    "CompactionConfig",
    "FileMeta",
    "LakeCompactor",
    "determine_base_file_name",
    "filter_compacted",
    "filter_compacted_gcp",
    "should_skip_compacting",
    "lake_report",
    "rowgroup_report",
    "scan_parquet_footers",
    "scan_parquet_schemas",
    "schema_drift_report",
]
