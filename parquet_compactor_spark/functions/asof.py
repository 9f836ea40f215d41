"""As-of (most-recent-prior) join — an operator Spark lacks natively.

Implemented as the classic scalable composition: tag both inputs, union,
then one window pass per key ordered by time where right-side values are
carried forward with ``last(..., ignorenulls=True)``. Cost: ONE shuffle on
the key (the window partition) — versus the naive range-join + row_number
which shuffles pairs. This is the form that survives 100 TB event tables.

Semantics: for each left row, the right row with the greatest
``right_ts <= left_ts`` within the same key (inclusive, like DuckDB's
ASOF JOIN with ``<=``). Ties inside the right side must be pre-resolved
(dedupe right on (key, ts)) — enforced here with max_by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest ``right`` values at or before each left row.

    left/right share the key column ``on`` and event-time column ``ts``;
    ``value_cols`` are the right-side columns to carry. Returns all left
    columns plus ``<value><suffix>`` columns (NULL when no prior right row).
    """
    # Right side unique per (key, ts): keep the lexicographically-last row.
    rdedup = right.groupBy(on, ts).agg(
        *[F.max_by(c, F.struct(*value_cols)).alias(c) for c in value_cols]
    )

    lt = left.withColumn("__side", F.lit(1))
    rt = rdedup.select(
        on,
        ts,
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    # Right rows sort BEFORE left rows at equal ts → inclusive (<=) asof.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__carry_{c}")
            for c in value_cols
        ],
    )
    return (
        carried.filter(F.col("__side") == 1)
        .drop("__side", *[f"{c}{suffix}" for c in value_cols])
        .withColumnsRenamed({f"__carry_{c}": f"{c}{suffix}" for c in value_cols})
    )
