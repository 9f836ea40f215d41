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

Why ``mapInArrow`` and not ``mapInPandas``: the pandas→Arrow return path
uses ``from_pandas`` semantics, which silently turns float NaN into SQL
NULL — a NaN score that the final window would rank FIRST (Spark orders
NaN as the largest double) comes back as a NULL it ranks LAST. Owning
the Arrow conversion keeps NaN a value on the wire.
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

    Null/NaN parity with the final window (the map stage must never prune
    a row the window would rank ≤ k):

    - **Null keys** are real groups: the map-side groupby runs with
      ``dropna=False``, matching the window's PARTITION BY.
    - **Float sort columns**: Spark orders NaN as the LARGEST double, so
      the local sort places NaN last on ascending / first on descending,
      and the Arrow return path preserves NaN as a value (see module
      docstring). Caveat: Arrow→pandas hands SQL NULL and NaN to the
      local sort as the same ``NaN``, so a float sort column containing
      BOTH cannot be pruned faithfully map-side (Spark ranks NULL
      smallest, NaN largest) — coalesce or filter NULLs in float sort
      columns before calling.
    - **Int/bool/other sort columns**: nullable pandas dtypes keep NULL
      distinct, ordered per Spark's default (ASC NULLS FIRST / DESC
      NULLS LAST — null smallest).
    """
    import pandas as pd
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    schema = df.schema
    schema_arrow = to_arrow_schema(schema)

    # Arrow→pandas with nullable dtypes for ints/bools so NULLs survive
    # the round trip (default conversion would degrade int64+NULL to
    # float64 NaN and re-emit it as a *value* gone wrong).
    _nullable = {
        pa.int8(): pd.Int8Dtype(),
        pa.int16(): pd.Int16Dtype(),
        pa.int32(): pd.Int32Dtype(),
        pa.int64(): pd.Int64Dtype(),
        pa.bool_(): pd.BooleanDtype(),
    }

    def spark_ordered(cand: pd.DataFrame) -> pd.DataFrame:
        # Lexicographic sort as a stable per-column pass (last key first)
        # so na_position can differ per column, mirroring Spark ordering.
        for c, asc in reversed(list(zip(sort_cols, ascending))):
            if pd.api.types.is_float_dtype(cand[c]):
                na_pos = "last" if asc else "first"  # NaN = largest (Spark)
            else:
                na_pos = "first" if asc else "last"  # NULL = smallest (Spark)
            cand = cand.sort_values(
                c, ascending=asc, kind="mergesort", na_position=na_pos
            )
        return cand

    def to_batch(acc: pd.DataFrame) -> pa.RecordBatch:
        arrays = []
        for f in schema_arrow:
            col = acc[f.name]
            if pa.types.is_floating(f.type):
                # from_pandas=False: NaN stays a NaN value, not NULL.
                arrays.append(
                    pa.array(
                        col.to_numpy(dtype="float64"),
                        type=f.type,
                        from_pandas=False,
                    )
                )
            else:
                arrays.append(pa.array(col, type=f.type, from_pandas=True))
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
