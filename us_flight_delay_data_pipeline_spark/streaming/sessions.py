"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

This is the streaming twin of ``queries.sessions_and_ann.
sessionize_events`` (lag/cumsum batch form) and ``session_window_native``
(Spark's built-in gap-merge). Neither built-in covers the general
custom-state case — per-key state that survives micro-batches with
event-time timeouts — so this operator is the template for anything
stateful the built-ins can't express (running dedup windows,
per-entity rate limits, incremental sketches).

Semantics: events for a user belong to one session while consecutive
gaps are <= ``gap``. A session is EMITTED when

- a later event breaks the gap (closed in-stream), or
- the event-time watermark passes ``last_event + gap`` (closed by
  timeout — this is what bounds state on an unbounded stream; without
  it, one-visit users would pin state forever at 100 TB/day).

Timeout boundary is STRICT: Spark fires an event-time timeout only
when the watermark strictly exceeds the registered timestamp (the
built-in ``session_window`` evicts on >=). If the watermark delay
equals the gap and event times are grid-aligned, the watermark can
tie the timeout exactly and eviction slips one micro-batch — pick a
delay that is not congruent with the gap (tests use 29 min vs a
30-min gap).

Timestamps cross the Arrow boundary as epoch-micros int64 (timezone-
and pandas-datetime-unit-proof); the wrapper converts back to
timestamps at the edge.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType)

__all__ = ["sessionize_stream", "SESSION_OUT_SCHEMA"]

# Emitted closed sessions (micros kept alongside for test determinism).
SESSION_OUT_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_start_us", LongType(), False),
    StructField("session_end_us", LongType(), False),
    StructField("n_events", LongType(), False),
    StructField("total_value", DoubleType(), True),
])

_STATE_SCHEMA = StructType([
    StructField("start_us", LongType(), False),
    StructField("last_us", LongType(), False),
    StructField("n", LongType(), False),
    StructField("total", DoubleType(), False),
])


def _make_handler(gap_us: int, use_timeout: bool):
    def handle(key: tuple[Any, ...], pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
               state: GroupState) -> Iterator["pandas.DataFrame"]:
        import pandas as pd
        (user_id,) = key

        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id], "session_start_us": [start_us],
                "session_end_us": [last_us], "n_events": [n],
                "total_value": [total]})
            return

        batches = [pdf for pdf in pdfs if len(pdf)]
        if not batches:
            return
        ev = pd.concat(batches).sort_values(["ts_us", "event_id"])

        cur = list(state.get) if state.exists else None
        closed: list[list[Any]] = []
        for ts_us, value in zip(ev["ts_us"].astype("int64"),
                                ev["value"].astype("float64")):
            ts_us, value = int(ts_us), float(value)
            if cur is None:
                cur = [ts_us, ts_us, 1, value]
            elif ts_us - cur[1] > gap_us:
                closed.append(cur)
                cur = [ts_us, ts_us, 1, value]
            else:
                cur[1] = ts_us
                cur[2] += 1
                cur[3] += value
        state.update(tuple(cur))
        if use_timeout:
            # close the open session when the watermark passes
            # last_event + gap (timeout timestamps are millis)
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                [[user_id, s[0], s[1], s[2], s[3]] for s in closed],
                columns=["user_id", "session_start_us", "session_end_us",
                         "n_events", "total_value"])

    return handle


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str | None = "2 hours") -> DataFrame:
    """Streaming gap sessionization over an (event_id, ts, user_id,
    value) stream. With ``watermark`` set, open sessions are flushed
    by event-time timeout once the watermark passes last_event + gap;
    with ``watermark=None`` (NoTimeout), only in-stream-closed
    sessions are emitted and state is unbounded — test/diagnostic use
    only."""
    gap_us = gap_minutes * 60 * 1_000_000
    use_timeout = watermark is not None
    if use_timeout:
        events = events.withWatermark("ts", watermark)
    # keep the watermarked `ts` attribute itself in scope — event-time
    # timeout requires the watermark column to reach the stateful op
    prepped = events.select(
        "user_id", "event_id", "ts",
        F.unix_micros("ts").alias("ts_us"), "value")
    out = prepped.groupBy("user_id").applyInPandasWithState(
        _make_handler(gap_us, use_timeout),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(GroupStateTimeout.EventTimeTimeout if use_timeout
                     else GroupStateTimeout.NoTimeout),
    )
    return out.select(
        "user_id",
        F.timestamp_micros("session_start_us").alias("session_start"),
        F.timestamp_micros("session_end_us").alias("session_end"),
        "n_events", "total_value")
