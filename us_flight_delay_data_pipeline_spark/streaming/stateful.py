"""Arbitrary stateful streaming v2 (Spark 4 ``transformWithState``
API): a running per-key aggregate with durable keyed ValueState —
the modern successor to ``applyInPandasWithState`` (which
streaming/sessions.py demonstrates; both stay covered because the
two APIs have different state models: GroupState vs named state
variables + timers).

The aggregate is exact by construction: values are quantized to
integer cents with ``floor(v * 100 + 0.5)`` (IEEE-exact, the
registry-wide recipe) and summed as Python ints (arbitrary
precision), so the streaming totals are bit-equal to a batch
group-by whatever the batch boundaries — pinned by
tests/test_stateful_v2.py.

Scale: state lives in the state store keyed by user_id (RocksDB on a
cluster), one Arrow hop per key-batch; emissions are one row per
ACTIVE key per micro-batch (update semantics), not a full-state dump.

Environment gate: the v2 state server speaks protobuf; containers
without ``google.protobuf`` can import this module (no top-level
dependency) but the stream will fail at start — the test module
skips itself accordingly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.stateful_processor import (StatefulProcessor,
                                                      StatefulProcessorHandle)

__all__ = ["RunningUserTotals", "stream_running_user_totals",
           "TOTALS_SCHEMA"]

TOTALS_SCHEMA = "user_id BIGINT, n_events BIGINT, total_cents BIGINT"


class RunningUserTotals(StatefulProcessor):
    """Per-user running (count, exact-cents sum) over an event
    stream; emits the updated running totals for every user seen in
    the micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState(
            "agg", "n_events BIGINT, total_cents BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd
        n = 0
        cents = 0
        for pdf in rows:
            n += len(pdf)
            # floor(v*100 + 0.5) per row, summed as Python ints —
            # order-independent, engine-exact
            cents += sum(int(math.floor(v * 100.0 + 0.5))
                         for v in pdf["value"].astype(float))
        prev = self._agg.get()
        if prev is not None:
            n += int(prev[0])
            cents += int(prev[1])
        self._agg.update((n, cents))
        yield pd.DataFrame({"user_id": [int(key[0])],
                            "n_events": [n],
                            "total_cents": [cents]})

    def close(self) -> None:
        # Required by the StatefulProcessor ABC; this processor holds
        # no resources outside the state store, so teardown is a
        # deliberate no-op.
        pass


def stream_running_user_totals(events: DataFrame, out_path: str,
                               checkpoint: str,
                               available_now: bool = True) -> StreamingQuery:
    """events(user_id, value, ...) stream -> per-batch updated running
    totals appended to ``out_path`` with the micro-batch id (the
    latest batch_id per user is the current state — update semantics
    over an append-only sink)."""
    from pyspark.sql import functions as F

    totals = (events.select("user_id", "value")
              .groupBy("user_id")
              .transformWithStateInPandas(
                  statefulProcessor=RunningUserTotals(),
                  outputStructType=TOTALS_SCHEMA,
                  outputMode="Update",
                  timeMode="None"))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.withColumn("batch_id", F.lit(batch_id).cast("bigint"))
                 .write.mode("append").parquet(out_path))

    writer = (totals.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
