"""Similarity search over the ``embeddings`` table (array<float> vectors).

Brute-force cosine top-k is the correctness baseline; LSH/IVF-bucketed
variants are the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_compactor_spark.registry import load, register


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array columns (zip_with + aggregate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


@register(
    "q_sim_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id,
               e.label,
               ROUND(
                 list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                  list_transform(q.qvec, x -> CAST(x AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(q.qvec,      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                 4) AS cos_sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, label, cos_sim
    FROM scored
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
    doc="Brute-force cosine top-k against a query vector (vec_id=0). The "
    "query vector is a broadcast scalar (crossJoin of a 1-row DF); scoring "
    "is JVM-side zip_with/aggregate; top-k is TakeOrderedAndProject. At "
    "100 TB the same plan holds — broadcast query, map-side score, heap-k.",
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(
                dot(F.col("embedding"), F.col("qvec"))
                / (l2_norm(F.col("embedding")) * l2_norm(F.col("qvec"))),
                4,
            ).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(10)
