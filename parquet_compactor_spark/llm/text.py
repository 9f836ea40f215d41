"""Text-analysis operators over the ``documents`` table.

Token counting, quality scoring, fingerprinting, language-ID — all as
JVM-side column expressions (regexp/split/length), no Python in the hot
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_compactor_spark.registry import load, register


@register(
    "q_text_stats",
    oracle="""
    SELECT lang,
           COUNT(*)                                   AS n_docs,
           ROUND(AVG(CAST(length(text) AS DOUBLE)), 4) AS avg_chars,
           ROUND(AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS avg_tokens,
           SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS total_tokens
    FROM documents
    GROUP BY lang
    """,
    doc="Per-language corpus statistics: char counts and whitespace token "
    "counts, aggregated. split() is JVM-side; one shuffle on lang.",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ", -1))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.length("text").cast("double")), 4).alias("avg_chars"),
        F.round(F.avg(n_tokens.cast("double")), 4).alias("avg_tokens"),
        F.sum(n_tokens.cast("bigint")).alias("total_tokens"),
    )
