"""Lake health report: per-leaf small-file diagnostics from metadata only.

The operational question the compactor answers daily is "which leaves
need compacting, and how badly?". This module answers it WITHOUT reading
any data: the same single recursive listing the compactor plans from
(``HadoopFS.list_files`` — one flat key-prefix scan on an object store)
becomes a DataFrame of per-leaf statistics, so the report over a
million-object lake costs one listing plus KB-scale aggregation.

Reference parity: the reference has no reporting surface at all — its
only observability is per-leaf stdout lines during a compaction run
(parquet_compactor.py:295-328). This is the north-star extension that
makes the compactor schedulable: run the report, rank by
``reclaimable_files``, and feed the worst leaves to
``LakeCompactor.compact`` first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_compactor_spark.compactor.core import CompactionConfig
from parquet_compactor_spark.compactor.fs import HadoopFS

_REPORT_SCHEMA = (
    "leaf string, n_files bigint, total_bytes bigint, small_files bigint, "
    "small_bytes bigint, largest_file_bytes bigint, newest_mtime double"
)


def lake_report(
    spark: SparkSession, root: str, config: CompactionConfig | None = None
) -> DataFrame:
    """Per-leaf lake statistics as a DataFrame (metadata only, no data read).

    Columns: leaf, n_files, total_bytes, small_files (< target size),
    small_bytes, largest_file_bytes, newest_mtime, plus derived
    small_file_ratio and ideal_files (ceil(small_bytes/target): how many
    target-size files the SMALL files alone should occupy — already-big
    files are not rewritten, so they don't enter the ideal) —
    ``small_files - ideal_files`` is the per-leaf reclaimable file count
    a compaction run would eliminate. Only ``*.parquet`` objects are
    counted: Spark-written leaves carry ``_SUCCESS``/checksum sidecars
    that a merge would never read, and counting them would inflate
    small_files/reclaimable_files.

    The listing is driver-side (it is the compactor's planning catalog —
    KBs per million files); the statistics become a DataFrame so ranking,
    filtering, and joining against other operational tables compose with
    the rest of the engine. For a lake whose METADATA exceeds driver
    memory, swap the listing for ``spark.read.format("binaryFile")``'s
    (path, length, modificationTime) scan — same downstream aggregation.
    """
    config = config or CompactionConfig()
    fs = HadoopFS(spark, root)
    rows = [
        (f.path.rsplit("/", 1)[0] + "/", 1, f.size, f.modified)
        for f in fs.list_files(root, distributed=True)
        if f.path.endswith(".parquet")
    ]
    if not rows:
        empty = spark.createDataFrame([], _REPORT_SCHEMA)
        # Cast to long: the non-empty branch's ceil/greatest yield bigint,
        # and a schema that flips int/bigint on emptiness breaks unions.
        return empty.withColumn(
            "small_file_ratio", F.lit(0.0)
        ).withColumn("ideal_files", F.lit(0).cast("long")).withColumn(
            "reclaimable_files", F.lit(0).cast("long")
        )
    target = config.file_size_bytes
    listing = spark.createDataFrame(
        rows, "leaf string, one int, size bigint, mtime double"
    )
    report = listing.groupBy("leaf").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("size").alias("total_bytes"),
        F.sum(F.when(F.col("size") < target, 1).otherwise(0)).alias("small_files"),
        F.sum(F.when(F.col("size") < target, F.col("size")).otherwise(0)).alias(
            "small_bytes"
        ),
        F.max("size").alias("largest_file_bytes"),
        F.max("mtime").alias("newest_mtime"),
    )
    return report.select(
        "*",
        F.round(F.col("small_files") / F.col("n_files"), 4).alias(
            "small_file_ratio"
        ),
        F.greatest(
            F.ceil(F.col("small_bytes") / F.lit(target)), F.lit(1)
        ).alias("ideal_files"),
    ).withColumn(
        "reclaimable_files",
        F.greatest(
            F.col("small_files") - F.col("ideal_files"), F.lit(0)
        ),
    )
