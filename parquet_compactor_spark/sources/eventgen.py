"""Custom PySpark DataSource: a deterministic synthetic event generator.

The Python DataSource API (Spark 4) is the extension seam the reference
lacks entirely — its ingestion is a fixed S3 parquet crawl
(parquet_compactor.py:80-99); here any Python-defined source plugs into
``spark.read.format(...)`` / ``spark.readStream.format(...)`` and gets
partition-parallel scans, predicate-free schema negotiation, and
streaming offset tracking from the engine.

Scale posture: generation is counter-based (event i is a pure function
of i), so every partition materializes only its own id slice on its own
executor — no driver-side data, no coordination, and a 1000-partition
read of 10^12 rows is embarrassingly parallel. The stream reader's
offset is a single row counter, so checkpoint state is O(1).

The generator doubles as the load source for soak-testing the
engine's own pipelines (bench.py's compaction lake is the batch twin).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)

_TYPES = ("click", "purchase", "signup", "error", "view")
_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z, microseconds
_STEP_US = 60_000_000  # one event per simulated minute


def _row(i: int) -> tuple[int, Any, int, str, float]:
    """Event ``i`` as a pure function of ``i`` (counter-based generation)."""
    import datetime as dt

    h = (i * 2654435761) % 4294967296
    ts = dt.datetime.fromtimestamp(
        (_BASE_US + i * _STEP_US) / 1e6, tz=dt.timezone.utc
    ).replace(tzinfo=None)
    return (
        i,
        ts,
        h % 1000,
        _TYPES[h % len(_TYPES)],
        round((h % 100000) / 500.0, 2),
    )


@dataclass
class _IdSlice(InputPartition):
    start: int
    end: int


class EventGenReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = -(-self.rows // self.n_parts)
        return [
            _IdSlice(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _IdSlice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class EventGenStreamReader(DataSourceStreamReader):
    """Micro-batched form: the offset is the next unread event id."""

    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.batch_rows = int(options.get("rowsPerBatch", 100))
        self.n_parts = int(options.get("partitions", 4))

    def initialOffset(self) -> dict:
        return {"next_id": 0}

    def latestOffset(self) -> dict:
        # Source caps at `rows` total; otherwise advance one batch worth.
        return {"next_id": self.rows}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        lo, hi = start["next_id"], end["next_id"]
        if hi <= lo:
            return [_IdSlice(lo, lo)]
        step = -(-(hi - lo) // self.n_parts)
        return [
            _IdSlice(a, min(a + step, hi)) for a in range(lo, hi, step)
        ]

    def read(self, partition: _IdSlice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        pass  # offsets are pure counters; nothing to clean up


class EventGenDataSource(DataSource):
    """``spark.read.format("eventgen").option("rows", N)`` after
    ``spark.dataSource.register(EventGenDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> EventGenReader:
        return EventGenReader(self.options)

    def streamReader(self, schema: StructType) -> EventGenStreamReader:
        return EventGenStreamReader(self.options)
