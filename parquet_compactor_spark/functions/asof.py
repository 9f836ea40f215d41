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
    # Carry the right row as a STRUCT, not bare columns: the struct is
    # non-null for EVERY right row even when its fields are NULL, so
    # last(..., ignorenulls) finds the true as-of ROW and a NULL value
    # on that row stays NULL — skipping null-valued right rows would
    # diverge from ASOF semantics (DuckDB returns the row regardless;
    # caught by the hostile NULL-fixture sweep).
    rt = rdedup.select(
        on,
        ts,
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__rrow"),
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    # Right rows sort BEFORE left rows at equal ts → inclusive (<=) asof.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("__rrow", ignorenulls=True).over(w).alias("__carry")
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            "*",
            *[
                F.col("__carry").getField(c).alias(f"{c}{suffix}")
                for c in value_cols
            ],
        )
        .drop("__side", "__rrow", "__carry")
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_id: str,
) -> DataFrame:
    """Nearest-direction as-of join: for each left row, the right row with
    the smallest |right_ts - left_ts| within the key (ties → lowest id).

    Same union trick as :func:`asof_join`, but TWO window passes over the
    SAME key partitioning — one ascending (last prior) and one descending
    (first following) — so Spark satisfies both with two sorts over ONE
    exchange. Left rows with no right row on either side are dropped
    (inner semantics). Returns left columns + ``<right_id>`` + ``gap_us``.
    """
    rdedup = right.groupBy(on, ts).agg(F.min(right_id).alias(right_id))

    lt = left.withColumn("__side", F.lit(1))
    rt = rdedup.select(
        on, ts, F.lit(0).alias("__side"), F.col(right_id).alias("__rid")
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    cand = F.when(
        F.col("__side") == 0, F.struct(F.col(ts).alias("rts"), F.col("__rid").alias("rid"))
    )

    w_back = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last(cand, ignorenulls=True).over(w_back).alias("__b"),
        F.last(cand, ignorenulls=True).over(w_fwd).alias("__f"),
    ).filter(F.col("__side") == 1)

    d_b = F.unix_micros(F.col(ts)) - F.unix_micros(F.col("__b.rts"))
    d_f = F.unix_micros(F.col("__f.rts")) - F.unix_micros(F.col(ts))
    pick_b = F.col("__f").isNull() | (
        F.col("__b").isNotNull()
        & (
            (d_b < d_f)
            | ((d_b == d_f) & (F.col("__b.rid") <= F.col("__f.rid")))
        )
    )
    return (
        carried.filter(F.col("__b").isNotNull() | F.col("__f").isNotNull())
        .select(
            "*",
            F.when(pick_b, F.col("__b.rid")).otherwise(F.col("__f.rid")).alias(right_id),
            F.when(pick_b, d_b).otherwise(d_f).alias("gap_us"),
        )
        .drop("__side", "__rid", "__b", "__f")
    )
