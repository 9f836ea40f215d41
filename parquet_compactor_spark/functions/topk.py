"""Distributed top-k per key without a giant-partition window.

``ROW_NUMBER() OVER (PARTITION BY key ORDER BY score)`` needs each key's
FULL row set in one task — fine when keys are numerous (q_window_topn's
per-customer ranks), fatal when a handful of keys each span the corpus
(a batch of 5 ANN queries scored against every document: 5 partitions,
each corpus-sized). A plain two-stage ``collect_list`` + slice doesn't
help either: list aggregates have unbounded partial state, so the
shuffle still carries every row.

:func:`grouped_topk` is the scale-correct decomposition:

1. **map side** — each input partition keeps a bounded per-key top-k
   (Arrow-batched ``mapInArrow``; state is ≤ k rows per key per task,
   folded batch by batch). This is the pattern's one legitimate
   imperative step: Spark has no built-in aggregate with bounded
   top-k partial state (``collect_top_k`` is internal-only).
2. **merge** — the surviving O(partitions × k) candidates per key (KBs)
   shuffle once and a window ranks them; the window's partitions are
   candidate-sized, never corpus-sized.

Same partial/final shape as Spark's own TakeOrderedAndProject,
generalized from global top-k to per-key.

Why ``mapInArrow`` and not ``mapInPandas``: the pandas seam on both
sides of ``mapInPandas`` collapses SQL NULL and float NaN into one
``NaN`` and returns it as NULL — so a NaN score the final window ranks
FIRST (Spark: NaN > any double) silently became a NULL it ranks LAST,
and NULLs in float *payload* columns came back as NaN values. Owning
the Arrow conversion with pandas' masked (nullable) dtypes keeps NULL
and NaN distinct end-to-end: Arrow null → ``pd.NA``, NaN stays a value,
and ``pa.array(..., from_pandas=True)`` on a masked array maps only NA
back to null.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    key_cols: list[str],
    sort_cols: list[str],
    ascending: list[bool],
    k: int,
) -> DataFrame:
    """Top-k rows per key under (sort_cols, ascending) order.

    Returns the input columns plus ``rn`` (1-based rank per key).
    Deterministic when ``sort_cols`` is a total order per key (include a
    unique id as the last sort column).

    Null/NaN parity with the final window (the map stage must never
    prune a row the window would rank ≤ k, and must never alter a
    value):

    - **Null keys** are real groups: the map-side groupby runs with
      ``dropna=False``, matching the window's PARTITION BY.
    - **Sort ordering** matches Spark exactly, including float columns
      holding BOTH SQL NULL and NaN: with masked dtypes pandas sorts a
      genuine NaN as the largest value (Spark: NaN > any double) while
      NA follows ``na_position``, which is set per direction to Spark's
      default null rule (ASC NULLS FIRST / DESC NULLS LAST).
    - **Values round-trip bit-faithfully**: nullable Int/Float/Boolean
      dtypes keep NULL ≠ NaN and NULL-bearing int columns never degrade
      to float.
    """
    import pandas as pd
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    schema = df.schema
    schema_arrow = to_arrow_schema(schema)

    # Arrow→pandas with masked (nullable) dtypes: Arrow null → pd.NA,
    # float NaN stays a value, int columns keep their type under NULLs.
    _nullable = {
        pa.int8(): pd.Int8Dtype(),
        pa.int16(): pd.Int16Dtype(),
        pa.int32(): pd.Int32Dtype(),
        pa.int64(): pd.Int64Dtype(),
        pa.float32(): pd.Float32Dtype(),
        pa.float64(): pd.Float64Dtype(),
        pa.bool_(): pd.BooleanDtype(),
    }

    def spark_ordered(cand: pd.DataFrame) -> pd.DataFrame:
        # Lexicographic sort as a stable per-column pass (last key first)
        # so na_position can differ per column direction. NULL (pd.NA) is
        # the smallest value in Spark's default asc/desc orderings; NaN
        # needs no handling — masked-dtype sorts place it largest, which
        # is Spark's rule.
        for c, asc in reversed(list(zip(sort_cols, ascending))):
            na_pos = "first" if asc else "last"
            cand = cand.sort_values(
                c, ascending=asc, kind="mergesort", na_position=na_pos
            )
        return cand

    def to_batch(acc: pd.DataFrame) -> pa.RecordBatch:
        # from_pandas=True on masked arrays maps pd.NA → null and keeps
        # NaN as a value (plain-numpy NaN→null coercion never applies).
        arrays = [
            pa.array(acc[f.name], type=f.type, from_pandas=True)
            for f in schema_arrow
        ]
        return pa.RecordBatch.from_arrays(arrays, schema=schema_arrow)

    def local_topk(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: pd.DataFrame | None = None
        for batch in batches:
            pdf = batch.to_pandas(types_mapper=_nullable.get)
            cand = pdf if acc is None else pd.concat([acc, pdf])
            cand = spark_ordered(cand)
            acc = cand.groupby(key_cols, dropna=False, sort=False).head(k)
        if acc is not None and len(acc):
            yield to_batch(acc)

    candidates = df.mapInArrow(local_topk, schema)
    order = [
        F.col(c).asc() if asc else F.col(c).desc()
        for c, asc in zip(sort_cols, ascending)
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
