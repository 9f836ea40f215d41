"""Deduplication operators over the ``documents`` table.

Exact dedup is a hash-groupBy; near-dup families (MinHash-LSH, SimHash,
n-gram Jaccard) land here as they are implemented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_compactor_spark.registry import load, register


@register(
    "q_dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS keep_id,
           COUNT(*)    AS n_copies,
           MIN(n_chars) AS n_chars
    FROM documents
    GROUP BY md5(text)
    """,
    doc="Exact deduplication: group documents by content hash, keep the "
    "lowest doc_id. Hash-groupBy is one shuffle on a uniform key — the "
    "canonical 100 TB-safe exact-dedup plan.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("n_chars").alias("n_chars"),
        )
        .drop("content_hash")
    )
