"""Skew mitigation: salting for hot keys in joins and aggregations.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these utilities are the explicit, plan-level tool for the cases
AQE can't fix — a build side too big to broadcast joined on a key where a
handful of values dominate (events.user_id-style power laws), or
aggregations whose per-key state is itself heavy.

Salting is deterministic here (hash of a caller-named column, not rand()),
so plans stay reproducible and retries are safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _salt_of(col: Column, buckets: int) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("int")


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    salt_source: str,
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation through a salt: partial per (keys, salt), then
    final per keys. ``aggs`` maps output name → (input col, fn) where fn is
    re-aggregatable: sum | count | min | max.

    Spark's hash aggregate already partial-aggregates map-side, so use
    this only when per-key *reduce-side* state is the bottleneck (e.g.
    extreme single-key row counts where even the final agg's one-key
    partition overloads a task).
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn in (fn for _, fn in aggs.values()):
        if fn not in mergers:
            raise ValueError(f"non-reaggregatable fn: {fn}")

    salted = df.withColumn(SALT_COL, _salt_of(F.col(salt_source), buckets))
    partial = salted.groupBy(*group_cols, SALT_COL).agg(
        *[firsts[fn](col).alias(name) for name, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[mergers[fn](name).alias(name) for name, (col, fn) in aggs.items()]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Inner equi-join where ``skewed``'s hot join keys are spread across
    ``buckets`` sub-keys and ``other`` is replicated per bucket.

    The skewed side gets a deterministic salt from ``salt_source`` (any
    column that varies within a hot key — defaults to the whole-row hash via
    all columns); the other side is exploded x buckets. Join key becomes
    (on, salt) — a hot key's rows now land on ``buckets`` tasks instead of
    one. Cost: ``other`` is shuffled x buckets, so use on dimension-sized
    right sides that still exceed the broadcast threshold.
    """
    if salt_source is not None:
        salt = _salt_of(F.col(salt_source), buckets)
    else:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(buckets)).cast(
            "int"
        )
    left = skewed.withColumn(SALT_COL, salt)
    right = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return left.join(right, [on, SALT_COL]).drop(SALT_COL)
