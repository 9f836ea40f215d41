"""User-defined table and aggregate functions (the UDTF/UDAF surface).

The engine's declarative plans cover the hot path; these two queries
exist to pin the *extension* APIs — a Python UDTF (lateral table
function) and an Arrow-vectorized grouped-aggregate pandas UDF — each
against a DuckDB oracle, so a user who genuinely needs custom row
expansion or a custom aggregate has a verified template. Both are
deliberately OFF the hot path elsewhere in the repo: every other
operator uses built-in columnar expressions (UDFs are the slow path;
reference parity for extensibility, not a performance recommendation).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from parquet_compactor_spark.registry import load, register

UDTF_MAX_TOKENS = 5


class SplitTokens:
    """Yield (position, token) for a document's first 5 whitespace tokens.

    Row-at-a-time Python — exactly what the UDTF contract is for
    (arbitrary per-row expansion logic). The declarative twin is
    explode(split(...)); this exists to verify the extension API.
    The ``udtf()`` wrapper is applied lazily inside the query: parsing
    the DDL return type requires an active SparkSession, which does not
    exist at module import time.
    """

    def eval(self, text: str):
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")[:UDTF_MAX_TOKENS]):
            yield i, tok


@register(
    "q_udtf_tokens",
    oracle="""
    WITH toks AS (
        -- NULL text pinned out on BOTH engines: the UDTF yields nothing
        -- for a NULL doc while tokens[n] over a NULL list would emit
        -- NULL-token rows here (r7 hostile NULL-text sweep find).
        SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
        WHERE text IS NOT NULL
    ),
    expl AS (
        SELECT doc_id, tokens,
               unnest(range(1, least(len(tokens), 5) + 1)) AS n
        FROM toks
    )
    SELECT doc_id, CAST(n - 1 AS INT) AS pos, tokens[n] AS token
    FROM expl
    """,
    doc="Python UDTF via LATERAL join: per-document token expansion "
    "(first 5 tokens with positions), oracle-checked against the "
    "equivalent unnest. The UDTF runs once per input row on executors — "
    "parallel, but row-at-a-time Python: the documented slow-path "
    "escape hatch, not the default (q_doc_chunking is the columnar way).",
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("split_tokens", udtf(SplitTokens, returnType="pos int, token string"))
    load(spark, sf_dir, "documents").createOrReplaceTempView("_udx_documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM _udx_documents d, LATERAL split_tokens(d.text) t
        WHERE d.text IS NOT NULL
        """
    )


def _geo_mean_udaf():
    """Vectorized grouped-aggregate UDAF: geometric mean of positive values.

    Arrow ships each group's column as one pandas Series (no per-row
    Python), the standard custom-aggregate form when an aggregate has no
    built-in equivalent. Built lazily — pandas_udf parses its DDL type
    against the active SparkSession.
    """

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        pos = v[v > 0]
        return float(np.exp(np.log(pos.astype("float64")).mean()))

    # Spark cannot mix grouped-agg pandas UDFs with built-in aggregates
    # in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a
    # pandas aggregate too.
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    return geo_mean, n_rows


@register(
    "q_udaf_geomean",
    oracle="""
    SELECT event_type,
           ROUND(EXP(AVG(LN(value))), 4) AS geo_mean_value,
           COUNT(*)                      AS n
    FROM events
    WHERE value > 0
    GROUP BY event_type
    """,
    doc="Custom aggregate via Arrow-vectorized grouped pandas UDF: "
    "per-type geometric mean, oracle-checked against the closed form "
    "EXP(AVG(LN(x))). Grouped-agg pandas UDFs cannot partially "
    "aggregate (the whole group's column reaches one executor) — fine "
    "for bounded groups; for 100 TB hot paths prefer the closed form, "
    "which this oracle demonstrates is expressible with built-ins.",
)
def q_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    geo_mean, n_rows = _geo_mean_udaf()
    return e.groupBy("event_type").agg(
        F.round(geo_mean("value"), 4).alias("geo_mean_value"),
        n_rows("value").alias("n"),
    )
