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


# ---------------------------------------------------------------------------
# Row-group-level lake audit: distributed parquet-footer scan.
# ---------------------------------------------------------------------------

_FOOTER_SCHEMA = (
    "path string, row_group_id int, n_rows bigint, compressed_bytes bigint, "
    "uncompressed_bytes bigint, n_columns int, error string"
)


def _posix_path(uri: str) -> tuple[str | None, str | None]:
    """(openable local path, error) for a listing URI.

    Executors open footers with pyarrow, which speaks posix paths (and,
    via fsspec, object stores this sandbox doesn't ship). file:// and
    bare paths resolve; any other scheme degrades ROW-WISE with a loud
    error string — an audit over a 100k-file lake must report the one
    unreadable file, not die on it.
    """
    if "://" not in uri:
        return uri, None
    from urllib.parse import unquote, urlsplit

    parts = urlsplit(uri)
    if parts.scheme == "file":
        return unquote(parts.path), None
    return None, f"{SCHEME_UNREADABLE_PREFIX}{parts.scheme}"


#: Error-string prefix for the "this ENVIRONMENT cannot open the footer"
#: class (vs a genuinely corrupt footer). Consumers that must distinguish
#: cannot-check from is-broken (the skip_schema_drift gate) match on it.
SCHEME_UNREADABLE_PREFIX = "unsupported filesystem scheme for footer read: "


def _distributed_footer_map(
    spark: SparkSession,
    paths: list[str],
    schema: str,
    dtypes: list[tuple[str, str]],
    per_file,
    error_row,
) -> DataFrame:
    """Shared harness for distributed per-file parquet-footer maps
    (:func:`scan_parquet_footers`, :func:`scan_parquet_schemas`): sorted
    round-robin path slicing so footer I/O parallelizes, pyarrow opens
    on the executor, and ROW-WISE degrade — an unopenable or corrupt
    file yields ``error_row(path, err)`` while healthy files in the
    same batch still resolve. ``per_file(local, path)`` returns the
    healthy rows for one file; ``dtypes`` is the (name, pandas dtype)
    list matching ``schema``."""
    import pandas as pd

    if not paths:
        return spark.createDataFrame([], schema)
    n_slices = min(len(paths), spark.sparkContext.defaultParallelism)
    # Explicit round-robin slicing: a 1-column createDataFrame would put
    # ALL paths in a handful of partitions and serialize the footer I/O.
    pdf = spark.createDataFrame(
        [(p,) for p in sorted(paths)], "path string"
    ).repartition(n_slices)

    def map_batches(it):
        for batch in it:
            rows: list[tuple] = []
            for p in batch["path"]:
                local, err = _posix_path(p)
                if err is None:
                    try:
                        rows.extend(per_file(local, p))
                        continue
                    except Exception as e:  # corrupt footer: loud row
                        err = f"{type(e).__name__}: {e}"[:200]
                rows.append(error_row(p, err))
            data = list(zip(*rows)) if rows else [[] for _ in dtypes]
            yield pd.DataFrame(
                {
                    name: pd.array(data[i], dtype=dt)
                    for i, (name, dt) in enumerate(dtypes)
                }
            )

    return pdf.mapInPandas(map_batches, schema=schema)


def scan_parquet_footers(spark: SparkSession, paths: list[str]) -> DataFrame:
    """ONE ROW PER ROW GROUP from the parquet footers of ``paths``,
    read DISTRIBUTED (each executor opens only its own files' footers —
    two small range reads per file on an object store, never the data
    pages). This is the scalable form of the per-file metadata loop a
    compactor planner wants: on a 1000-executor cluster a million
    footers resolve in one short map stage, where a driver-side loop
    (the reference's only option, and DuckDB's ``parquet_metadata``)
    serializes every open.

    Columns: path, row_group_id, n_rows, compressed_bytes (sum of
    column-chunk ``total_compressed_size``), uncompressed_bytes (the
    footer's ``total_byte_size``), n_columns, error. A corrupt or
    unreadable footer yields ONE row with row_group_id = -1 and the
    exception in ``error`` (row-wise degrade, the lake-seam
    discipline); healthy rows carry error = NULL.
    """

    def per_file(local, p):
        import pyarrow.parquet as pq

        # Context manager: a million-file audit must not rely on GC to
        # release executor fds.
        with pq.ParquetFile(local) as pf:
            md = pf.metadata
        rows = []
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            comp = sum(
                rg.column(j).total_compressed_size
                for j in range(rg.num_columns)
            )
            rows.append(
                (p, i, rg.num_rows, comp, rg.total_byte_size, rg.num_columns, None)
            )
        return rows

    return _distributed_footer_map(
        spark,
        paths,
        _FOOTER_SCHEMA,
        [
            ("path", "string"),
            ("row_group_id", "int32"),
            ("n_rows", "int64"),
            ("compressed_bytes", "int64"),
            ("uncompressed_bytes", "int64"),
            ("n_columns", "int32"),
            ("error", "string"),
        ],
        per_file,
        lambda p, err: (p, -1, 0, 0, 0, 0, err),
    )


def rowgroup_report(
    spark: SparkSession,
    root: str,
    min_rowgroup_rows: int = 100_000,
    paths: list[str] | None = None,
) -> DataFrame:
    """Per-leaf ROW-GROUP health — the pathology :func:`lake_report`
    cannot see. A leaf can pass the file-size report (every file at
    target size) while each file holds thousands of tiny row groups, and
    row groups ARE the scan/pushdown unit: predicate pruning, split
    planning, and page skipping all degrade with row-group count, so a
    right-sized file with 5,000 undersized groups scans like 5,000 tiny
    files. Such leaves need a re-write pass (``LakeCompactor.compact``
    re-chunks via ``chunked_rows``) even though the size report says
    they're done.

    Columns per leaf: n_files, n_row_groups, n_rows, avg_rg_rows,
    tiny_row_groups (< ``min_rowgroup_rows``), files_with_tiny_rgs,
    error_files, plus tiny_rg_ratio. Cost: one distributed listing +
    one distributed footer map (:func:`scan_parquet_footers`) — no data
    pages are ever read. Pass ``paths`` (an already-collected parquet
    listing) to reuse one lake listing across sibling reports instead
    of re-listing per report.
    """
    if paths is None:
        fs = HadoopFS(spark, root)
        paths = [
            f.path
            for f in fs.list_files(root, distributed=True)
            if f.path.endswith(".parquet")
        ]
    footers = scan_parquet_footers(spark, paths)
    leaf = F.expr(r"regexp_replace(path, '/[^/]+$', '/')").alias("leaf")
    per_file = (
        footers.select(
            leaf,
            "path",
            "row_group_id",
            "n_rows",
            "error",
        )
        .groupBy("leaf", "path")
        .agg(
            F.sum(F.when(F.col("error").isNull(), 1).otherwise(0)).alias("rgs"),
            F.sum(F.when(F.col("error").isNull(), F.col("n_rows"))).alias("rows"),
            F.sum(
                F.when(
                    F.col("error").isNull()
                    & (F.col("n_rows") < min_rowgroup_rows),
                    1,
                ).otherwise(0)
            ).alias("tiny_rgs"),
            F.max(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "is_error"
            ),
        )
    )
    return (
        per_file.groupBy("leaf")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("rgs").alias("n_row_groups"),
            F.coalesce(F.sum("rows"), F.lit(0)).alias("n_rows"),
            F.sum("tiny_rgs").alias("tiny_row_groups"),
            F.sum(F.when(F.col("tiny_rgs") > 0, 1).otherwise(0)).alias(
                "files_with_tiny_rgs"
            ),
            F.sum("is_error").alias("error_files"),
        )
        .select(
            "*",
            F.when(
                F.col("n_row_groups") > 0,
                F.round(F.col("tiny_row_groups") / F.col("n_row_groups"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("tiny_rg_ratio"),
            F.when(
                F.col("n_row_groups") > 0,
                (F.col("n_rows") / F.col("n_row_groups")).cast("bigint"),
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias("avg_rg_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Schema-drift lake audit: distributed parquet-schema scan.
# ---------------------------------------------------------------------------

_SCHEMA_SCAN_SCHEMA = (
    "path string, n_columns int, schema_fp string, columns string, "
    "error string"
)


def scan_parquet_schemas(spark: SparkSession, paths: list[str]) -> DataFrame:
    """ONE ROW PER FILE with the parquet footer's SCHEMA, read
    DISTRIBUTED exactly like :func:`scan_parquet_footers` (each executor
    opens only its own files' footers; data pages never touched).

    Columns: path, n_columns, schema_fp (md5 over the sorted
    ``name:type`` list — equal fingerprints == merge-compatible columns),
    columns (the sorted ``name:type`` list itself, NEWLINE-joined —
    pyarrow type strings legally contain commas, e.g.
    ``decimal128(10, 2)`` and ``struct<a: int64, b: string>``, so only
    a character no type can carry is a safe separator — letting drift
    DIFFS be computed downstream without reopening any file), error.
    Unreadable footers degrade row-wise with n_columns = -1 and the
    exception in ``error``; the cannot-open-this-scheme class is
    distinguishable from genuine corruption by the
    ``SCHEME_UNREADABLE_PREFIX`` error prefix.

    Why this exists: the reference ASSUMES schema compatibility across
    the files it merges (SURVEY.md §1.2 — never checked; awswrangler
    surfaces a failure only mid-merge as a caught ArrowException that
    silently skips the leaf's write). A positional/inferred union over
    drifted files is how lakes get corrupted, so this engine makes the
    check a first-class metadata-only audit.
    """
    def per_file(local, p):
        import hashlib

        import pyarrow.parquet as pq

        schema = pq.read_schema(local)
        cols = sorted(
            f"{name}:{schema.field(name).type}" for name in schema.names
        )
        joined = "\n".join(cols)
        fp = hashlib.md5(joined.encode()).hexdigest()
        return [(p, len(cols), fp, joined, None)]

    return _distributed_footer_map(
        spark,
        paths,
        _SCHEMA_SCAN_SCHEMA,
        [
            ("path", "string"),
            ("n_columns", "int32"),
            ("schema_fp", "string"),
            ("columns", "string"),
            ("error", "string"),
        ],
        per_file,
        lambda p, err: (p, -1, None, None, err),
    )


def schema_drift_report(
    spark: SparkSession, root: str, paths: list[str] | None = None
) -> DataFrame:
    """Per-leaf SCHEMA-DRIFT health — the pre-merge check the reference
    never performs. A leaf whose files disagree on columns or types
    cannot be safely merged without an explicit evolution policy
    (``CompactionConfig.merge_schema``), and the failure mode is the
    worst kind: a union that drops or NULL-fills columns depending on
    which file Spark samples for the inferred schema.

    Columns per leaf: n_files, error_files, n_schemas (distinct
    fingerprints among readable files; 1 == uniform), majority_files
    (the most common fingerprint's file count), drifted_files
    (readable files off the majority schema), n_drift_columns
    (DISTINCT column names whose ``name:type`` entry is present in
    SOME but not ALL readable files — added/removed columns and type
    changes both surface here), drift_columns (sorted, capped
    at 20 names, comma-joined — the actionable diff). Cost: one
    distributed listing + one distributed schema map; no data pages.
    Pass ``paths`` to reuse an already-collected listing.
    """
    if paths is None:
        fs = HadoopFS(spark, root)
        paths = [
            f.path
            for f in fs.list_files(root, distributed=True)
            if f.path.endswith(".parquet")
        ]
    scan = scan_parquet_schemas(spark, paths)
    leaf = F.expr(r"regexp_replace(path, '/[^/]+$', '/')").alias("leaf")
    files = scan.select(leaf, "path", "schema_fp", "columns", "error")
    per_leaf = files.groupBy("leaf").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
            "error_files"
        ),
        F.countDistinct("schema_fp").alias("n_schemas"),
    )
    fp_counts = (
        files.filter(F.col("error").isNull())
        .groupBy("leaf", "schema_fp")
        .agg(F.count(F.lit(1)).alias("fp_files"))
    )
    majority = fp_counts.groupBy("leaf").agg(
        F.max("fp_files").alias("majority_files"),
        F.sum("fp_files").alias("ok_files"),
    )
    # Drift columns: name:type tokens carried by some but not all
    # readable files of the leaf.
    tokens = (
        files.filter(F.col("error").isNull())
        .select("leaf", F.explode(F.split("columns", "\n")).alias("token"))
        .groupBy("leaf", "token")
        .agg(F.count(F.lit(1)).alias("token_files"))
    )
    drift_cols = (
        tokens.join(majority.select("leaf", "ok_files"), "leaf")
        .filter(F.col("token_files") < F.col("ok_files"))
        .select(
            "leaf", F.substring_index(F.col("token"), ":", 1).alias("name")
        )
        .groupBy("leaf")
        .agg(
            F.countDistinct("name").alias("n_drift_columns"),
            F.array_join(
                F.slice(F.array_sort(F.collect_set("name")), 1, 20), ","
            ).alias("drift_columns"),
        )
    )
    return (
        per_leaf.join(majority, "leaf", "left")
        .join(drift_cols, "leaf", "left")
        .select(
            "leaf",
            "n_files",
            "error_files",
            "n_schemas",
            F.coalesce("majority_files", F.lit(0)).alias("majority_files"),
            (
                F.coalesce("ok_files", F.lit(0))
                - F.coalesce("majority_files", F.lit(0))
            ).alias("drifted_files"),
            F.coalesce("n_drift_columns", F.lit(0)).alias("n_drift_columns"),
            F.coalesce("drift_columns", F.lit("")).alias("drift_columns"),
        )
        .orderBy(F.desc("drifted_files"), "leaf")
    )
