"""State API v2 sessionizer: ``transformWithStateInPandas``.

Spark 4's second-generation arbitrary-stateful-processing API
(``StatefulProcessor`` + typed state variables + event-time timers)
mirrors the v1 ``applyInPandasWithState`` sessionizer in
``streaming/pipeline.py`` — same 30-minute-gap semantics, same output
schema, same watermark-sealed emission — so either operator can back the
``q_sessionize`` surface and the batch gap-and-islands oracle validates
both.

The v2 Python worker serializes state over protobuf, which is absent
from this container, so the whole module is gated: ``HAVE_TWS`` is False
and ``sessionize_stream_v2`` raises a clear ImportError until
``google.protobuf`` appears on the Python path (no pip installs here —
the gate activates automatically when the environment gains it, exactly
like the spark-avro classpath gate in ``sources/io.py``). Round-11
verification of the flip mechanism: no protobuf wheel exists anywhere
on this container's disk (searched; installs forbidden), so the wheel
cannot be vendored — instead
``test_stateful_v2_gate_flips_open_when_protobuf_appears`` reloads this
module with an importable ``google.protobuf`` injected and asserts
HAVE_TWS flips True with the REAL ``StatefulProcessor`` bound (the
pyspark class itself imports fine without protobuf — only the v2
worker's state serialization needs it). The skip therefore converts to
a live run purely by the environment gaining the dependency; live
parity still requires the real wheel, which the parity test exercises
the moment it exists.

Scale posture (identical to v1): state is partitioned by user_id, holds
only OPEN sessions (sealed ones are emitted and evicted), and the
per-key timer re-wakes a key only when its earliest open session becomes
sealable — state volume is O(users active inside the watermark horizon),
independent of total history.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame

from parquet_compactor_spark.streaming.pipeline import (
    _STATE_SCHEMA,
    SESSION_GAP_MINUTES,
    SESSION_SCHEMA,
    _merge_sessions,
)

try:  # pragma: no cover - exercised only when protobuf is installed
    import google.protobuf  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAVE_TWS = True
except ImportError:  # protobuf (or the v2 API) not available
    HAVE_TWS = False
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = Any  # type: ignore[assignment,misc]

_GAP_US = SESSION_GAP_MINUTES * 60 * 1_000_000


def _sessions_to_pdf(user_id: int, done: list[tuple[int, int, int, float]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(done),
            "session_start": [pd.Timestamp(s, unit="us") for s, *_ in done],
            "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in done],
            "n_events": [n for _, _, n, _ in done],
            "total_value": [round(t, 2) for *_, t in done],
        }
    )


class SessionProcessor(StatefulProcessor):  # type: ignore[misc]
    """Per-user 30-min-gap sessions on the v2 state API.

    One ValueState variable holds the open-session interval lists (the
    same parallel-array schema as the v1 operator, so the two state
    layouts are field-for-field comparable); an event-time timer fires
    when the earliest open session's end + gap passes the watermark and
    flushes every sealed session.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sessions = handle.getValueState("sessions", _STATE_SCHEMA)
        # The expiry (ms) of the key's single pending timer. Without this
        # bookkeeping every batch would registerTimer() anew and pending
        # timers would ACCUMULATE per key — each stale one a spurious
        # handleExpiredTimer flush, unbounded timer state for hot keys.
        self._timer_due = handle.getValueState("timer_due", "due BIGINT")

    def _load(self) -> list[tuple[int, int, int, float]]:
        if not self._sessions.exists():
            return []
        starts, ends, counts, totals = self._sessions.get()
        return list(zip(starts, ends, counts, totals))

    def _set_timer(self, due_ms: int | None) -> None:
        """Move the key's one pending timer to ``due_ms`` (None → none)."""
        prev = self._timer_due.get()[0] if self._timer_due.exists() else None
        if prev == due_ms:
            return
        if prev is not None:
            self._handle.deleteTimer(prev)
        if due_ms is None:
            self._timer_due.clear()
        else:
            self._handle.registerTimer(due_ms)
            self._timer_due.update((due_ms,))

    def _flush(
        self, user_id: int, sessions: list[tuple[int, int, int, float]], wm_us: int
    ) -> Iterator[pd.DataFrame]:
        done = [s for s in sessions if s[1] + _GAP_US < wm_us]
        still_open = [s for s in sessions if s[1] + _GAP_US >= wm_us]
        if still_open:
            self._sessions.update(
                (
                    [s[0] for s in still_open],
                    [s[1] for s in still_open],
                    [s[2] for s in still_open],
                    [s[3] for s in still_open],
                )
            )
            next_due_ms = min(s[1] for s in still_open) // 1000 + _GAP_US // 1000 + 1
            self._set_timer(max(next_due_ms, wm_us // 1000 + 1))
        else:
            if self._sessions.exists():
                self._sessions.clear()
            self._set_timer(None)
        if done:
            yield _sessions_to_pdf(user_id, done)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterable[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        sessions = self._load()
        batches = list(rows)
        if batches:
            events = pd.concat(batches).sort_values("ts")
            for ts, value in zip(events["ts"], events["value"]):
                t_us = int(pd.Timestamp(ts).value // 1000)
                sessions.append((t_us, t_us, 1, float(value)))
            sessions = _merge_sessions(sessions, _GAP_US)
        yield from self._flush(user_id, sessions, timerValues.getCurrentWatermarkInMs() * 1000)

    def handleExpiredTimer(
        self, key: tuple[Any, ...], timerValues: Any, expiredTimerInfo: Any
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        # The firing timer is consumed; drop its bookkeeping so _flush
        # registers (not deletes) the next wake-up.
        self._timer_due.clear()
        yield from self._flush(
            user_id, self._load(), timerValues.getCurrentWatermarkInMs() * 1000
        )

    def close(self) -> None:
        pass


def sessionize_stream_v2(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """v2 twin of ``pipeline.sessionize_stream`` (same semantics/output).

    Raises ImportError with the unlock instruction while protobuf is
    absent — callers (and tests) can gate on ``HAVE_TWS``.
    """
    if not HAVE_TWS:
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf on the Python "
            "path (state serialization); install protobuf to activate the "
            "v2 operator — the v1 applyInPandasWithState sessionizer "
            "(streaming.pipeline.sessionize_stream) covers the same "
            "semantics meanwhile"
        )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionProcessor(),
            outputStructType=SESSION_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
