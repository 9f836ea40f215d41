"""LLM-training-data pipeline operators (north star, BASELINE.json).

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search, text analysis, and multimodal column plumbing.
Importing registers the queries.
"""

from parquet_compactor_spark.llm import (  # noqa: F401
    cluster,
    curation,
    dedup,
    graph,
    multimodal,
    pipeline,
    similarity,
    text,
)
