"""Differential-compare helpers mirroring the driver's oracle harness.

The driver compares row count + schema + order-insensitive value hash
(sorting columns by name). We reproduce that locally so every registered
query is validated before the driver ever sees it.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from parquet_compactor_spark.registry import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Queries round their float outputs; canonicalize residual fp noise.
        r = round(v, 6)
        if r == int(r):
            # Preserve the IEEE sign bit: the driver renders -0.0 distinctly
            # from 0.0 (DuckDB ROUND keeps -0.0, Spark round normalizes), so
            # collapsing both to "0" here would mask driver-only hash fails.
            if r == 0 and math.copysign(1.0, r) < 0:
                return "-0"
            return str(int(r))
        return repr(r)
    if isinstance(v, datetime):  # before date: datetime subclasses date
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def compare_to_oracle(spark_df, oracle: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB result (count, columns, value multiset)."""
    con = duck_connection(sf_dir)
    try:
        duck = con.execute(oracle)
        duck_cols = [d[0] for d in duck.description]
        duck_rows = duck.fetchall()
    finally:
        con.close()

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = canonical_rows(spark_cols, spark_rows)
    d = canonical_rows(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs (spark vs duck): {diffs}")
