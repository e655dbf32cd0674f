"""Streaming soak test (VERDICT r3 task #5): ≥20 micro-batches under
a real ``processingTime`` trigger with state-size monitoring.

Every other streaming test drains with ``availableNow`` (few
batches, then the query ends). This one runs the
``dropDuplicatesWithinWatermark`` pipeline — the same operator as
``stream_dedup_watermark_gated`` — across 24 micro-batches
(maxFilesPerTrigger=1, one file per batch) whose event times advance
one hour per batch, and asserts from the query's OWN progress
metrics (``stateOperators.numRowsTotal``) that state is EVICTED as
the watermark advances: peak state stays bounded by a few batches'
worth of keys while the total distinct-key count grows linearly.
Without eviction, state after batch N is N*K rows; with a 30-minute
watermark it must hold only the trailing window.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta, timezone

import pytest

# Long-running state-soak / backend-equivalence integration tests:
# excluded from the fast default profile (see pytest.ini); run with -m "".
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F
from pyspark.sql.types import (StringType, StructField, StructType,
                               TimestampType)

N_BATCHES = 24
KEYS_PER_BATCH = 200
_SCHEMA = StructType([
    StructField("user_id", StringType()),
    StructField("event_type", StringType()),
    StructField("ts", TimestampType()),
])


@pytest.fixture(scope="module")
def soak_dir(spark, tmp_path_factory):
    """One parquet file per future micro-batch; batch i's keys are
    unique to batch i (u{i}_{k}) and each key appears TWICE (the
    duplicate the operator must drop); event time advances 1 h per
    batch so the 30-min watermark passes batch i's events as soon as
    batch i+1 is seen."""
    root = tmp_path_factory.mktemp("soak")
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    for i in range(N_BATCHES):
        ts = t0 + timedelta(hours=i)
        rows = []
        for k in range(KEYS_PER_BATCH):
            for _ in range(2):  # exact duplicate within the batch
                rows.append((f"u{i}_{k}", "view", ts))
        df = spark.createDataFrame(rows, _SCHEMA).coalesce(1)
        df.write.mode("overwrite").parquet(str(root / f"b{i:04d}"))
    # flatten: the file source lists one directory; name files so
    # batch order follows event-time order
    flat = tmp_path_factory.mktemp("soak_flat")
    import glob
    import shutil
    for i in range(N_BATCHES):
        [part] = glob.glob(str(root / f"b{i:04d}" / "part-*.parquet"))
        dst = str(flat / f"f{i:04d}.parquet")
        shutil.copy(part, dst)
        # the file source orders micro-batches by MODIFICATION TIME;
        # fast same-second copies tie and can be picked out of
        # event-time order, advancing the watermark past an unread
        # file whose rows then drop as late — pin strictly ascending
        # mtimes so batch order == event-time order
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(flat)


def test_dedup_watermark_state_stays_bounded(spark, soak_dir, tmp_path):
    out_table = "soak_dedup_out"
    q = (spark.readStream.schema(_SCHEMA)
         .option("maxFilesPerTrigger", 1)
         .parquet(soak_dir)
         .withWatermark("ts", "30 minutes")
         .dropDuplicatesWithinWatermark(["user_id"])
         .writeStream.format("memory").queryName(out_table)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="50 milliseconds")
         .start())
    try:
        deadline = time.time() + 300
        state_totals: dict[int, int] = {}
        while time.time() < deadline:
            for p in q.recentProgress:
                ops = p.get("stateOperators") or []
                if ops:
                    state_totals[p["batchId"]] = sum(
                        o["numRowsTotal"] for o in ops)
            # file-source batches that carry rows: one per file (plus
            # possible empty watermark-commit batches)
            done = spark.table(out_table).count()
            if done >= N_BATCHES * KEYS_PER_BATCH and \
                    len(state_totals) >= N_BATCHES:
                break
            time.sleep(0.25)
        q.processAllAvailable()
        for p in q.recentProgress:
            ops = p.get("stateOperators") or []
            if ops:
                state_totals[p["batchId"]] = sum(
                    o["numRowsTotal"] for o in ops)
    finally:
        q.stop()

    # ≥20 micro-batches actually ran under the processingTime trigger
    assert len(state_totals) >= 20, sorted(state_totals)

    # exact dedup output: every batch's duplicate dropped, nothing else
    out = spark.table(out_table)
    assert out.count() == N_BATCHES * KEYS_PER_BATCH
    assert out.select("user_id").distinct().count() == \
        N_BATCHES * KEYS_PER_BATCH

    # BOUNDED state: the watermark (30 min, 1 h batch spacing) must
    # evict each batch's keys right after the next batch lands. Peak
    # state ≤ 3 batches of keys; unbounded growth would reach 24x.
    peak = max(state_totals.values())
    assert peak <= 3 * KEYS_PER_BATCH, dict(sorted(state_totals.items()))
    # and the LAST batches must not hold the whole history either
    tail = [state_totals[b] for b in sorted(state_totals)[-3:]]
    assert all(v <= 3 * KEYS_PER_BATCH for v in tail), tail
