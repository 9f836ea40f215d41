"""Data-quality metrics that ride the job: ``df.observe`` instrumentation.

A 100 TB pipeline cannot afford a second scan just to know whether the
batch it wrote was healthy. ``Dataset.observe`` attaches aggregate
expressions to an EXISTING plan: the metrics are computed by the same
tasks that execute the job (map-side partial aggregation, merged on the
driver via a listener-visible accumulator) and cost no extra pass, no
extra shuffle, and no action of their own.

Two entry points:

- :func:`with_quality_metrics` — wraps a DataFrame with a named
  observation carrying the standard health aggregates for the given
  columns (row count, per-column null counts, min/max). Whatever action
  the caller runs (a parquet write, a foreachBatch sink) also produces
  the metrics.
- :func:`observed_metrics` — reads the observation back from the
  DataFrame after an action ran (batch). In streaming, the same metrics
  arrive per micro-batch on ``StreamingQueryProgress.observedMetrics``
  — the pattern ``compact_stream``-style sinks use for per-batch
  accounting.

The reference has no data-quality surface; its only health signal is a
row-count log line after each merge. This is the Spark-first extension:
the merge's OWN job emits the health row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def quality_aggs(columns: list[str]) -> list:
    """The standard health aggregates: total rows, per-column null count
    and min/max. All partial-aggregatable — observation cost is O(columns)
    accumulator state per task, never a shuffle."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls")
        )
        aggs.append(F.min(c).alias(f"{c}__min"))
        aggs.append(F.max(c).alias(f"{c}__max"))
    return aggs


def with_quality_metrics(
    df: DataFrame, columns: list[str], name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach health metrics to ``df``'s plan; returns (df, observation).

    Run any action on the returned DataFrame (write, count, collect) and
    read ``observation.get`` — a dict of the aggregates — without a
    second scan. Works inside ``foreachBatch`` for per-micro-batch
    accounting.
    """
    obs = Observation(name)
    return df.observe(obs, *quality_aggs(columns)), obs


def observed_metrics(obs: Observation) -> dict:
    """The observation's metrics after an action ran (blocks until set)."""
    return dict(obs.get)
