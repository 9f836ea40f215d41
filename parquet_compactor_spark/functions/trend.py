"""Grouped-map pandas operator: per-key linear trend via applyInPandas.

The grouped-map member of the UDF family (mapInPandas → multimodal.py,
applyInPandasWithState → streaming/pipeline.py). Kept off the oracle path
deliberately — its JVM twin ``q_regr_slope`` (covar_pop/var_pop) is the
oracle-checked version, and tests assert the two agree — demonstrating
the engine's rule: built-ins in the hot path, Arrow-batched pandas only
when the per-group logic genuinely needs Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

TREND_SCHEMA = "user_id bigint, value_per_day double, n_events bigint"
US_PER_DAY = 86_400_000_000.0


def _group_trend(pdf: pd.DataFrame) -> pd.DataFrame:
    x = pdf["ts"].astype("int64") / 1e3  # ns → µs
    y = pdf["value"].astype("float64")
    n = len(pdf)
    if n < 2 or x.var(ddof=0) == 0.0:
        slope = float("nan")
    else:
        # Population covariance/variance — same formula as covar_pop/var_pop.
        slope = ((x - x.mean()) * (y - y.mean())).sum() / ((x - x.mean()) ** 2).sum()
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "value_per_day": [slope * US_PER_DAY],
            "n_events": [n],
        }
    )


def trend_per_user(events: DataFrame) -> DataFrame:
    """Per-user value-per-day slope via Arrow-batched grouped map."""
    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandas(
        _group_trend, schema=TREND_SCHEMA
    )
