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
   (Arrow-batched ``mapInPandas``; state is ≤ k rows per key per task,
   folded batch by batch). This is the pattern's one legitimate
   imperative step: Spark has no built-in aggregate with bounded
   top-k partial state (``collect_top_k`` is internal-only).
2. **merge** — the surviving O(partitions × k) candidates per key (KBs)
   shuffle once and a window ranks them; the window's partitions are
   candidate-sized, never corpus-sized.

Same partial/final shape as Spark's own TakeOrderedAndProject,
generalized from global top-k to per-key.
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
    """
    import pandas as pd

    schema = df.schema

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            cand = pdf if acc is None else pd.concat([acc, pdf])
            cand = cand.sort_values(sort_cols, ascending=ascending, kind="mergesort")
            acc = cand.groupby(key_cols, sort=False).head(k)
        if acc is not None and len(acc):
            yield acc

    candidates = df.mapInPandas(local_topk, schema)
    order = [
        F.col(c).asc() if asc else F.col(c).desc()
        for c, asc in zip(sort_cols, ascending)
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
