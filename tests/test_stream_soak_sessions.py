"""Session-stream soak (VERDICT r4 task #7): ≥20 micro-batches under
a real ``processingTime`` trigger for BOTH session operators — the
built-in ``session_window`` aggregate and the custom
``applyInPandasWithState`` sessionizer — asserting from the queries'
own progress metrics that per-key session state is EVICTED as the
watermark closes sessions.

Same harness shape as test_stream_soak.py (one parquet file per
micro-batch, event time advancing 1 h per batch, strictly ascending
file mtimes so batch order == event-time order): batch i holds a
3-event session for each of its own K unique users; the 30-min gap +
30-min watermark close batch i's sessions as soon as batch i+1 lands.
Bounded state = peak open-session rows stays within a few batches of
keys; unbounded would reach 24x.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from datetime import datetime, timedelta, timezone

import pytest

# Long-running state-soak / backend-equivalence integration tests:
# excluded from the fast default profile (see pytest.ini); run with -m "".
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType, TimestampType)

N_BATCHES = 24
KEYS_PER_BATCH = 100
EVENTS_PER_SESSION = 3
_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
])


@pytest.fixture(scope="module")
def session_soak_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sess_soak")
    flat = tmp_path_factory.mktemp("sess_soak_flat")
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    eid = 0
    for i in range(N_BATCHES):
        base = t0 + timedelta(hours=i)
        rows = []
        for k in range(KEYS_PER_BATCH):
            uid = i * 1000 + k
            for j in range(EVENTS_PER_SESSION):
                rows.append((eid, uid, base + timedelta(minutes=j), 1.0))
                eid += 1
        df = spark.createDataFrame(rows, _SCHEMA).coalesce(1)
        df.write.mode("overwrite").parquet(str(root / f"b{i:04d}"))
        [part] = glob.glob(str(root / f"b{i:04d}" / "part-*.parquet"))
        dst = str(flat / f"f{i:04d}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(flat)


def _soak(spark, streaming_df, out_table, ckpt_dir, expect_rows):
    """Run the streaming plan under processingTime until every closed
    session is emitted; return {batchId: state rows} from progress."""
    q = (streaming_df.writeStream.format("memory").queryName(out_table)
         .outputMode("append")
         .option("checkpointLocation", ckpt_dir)
         .trigger(processingTime="50 milliseconds")
         .start())
    state_totals: dict[int, int] = {}
    try:
        deadline = time.time() + 300

        def harvest():
            for p in q.recentProgress:
                ops = p.get("stateOperators") or []
                if ops:
                    state_totals[p["batchId"]] = sum(
                        o["numRowsTotal"] for o in ops)

        while time.time() < deadline:
            harvest()
            if spark.table(out_table).count() >= expect_rows and \
                    len(state_totals) >= N_BATCHES:
                break
            time.sleep(0.25)
        q.processAllAvailable()
        harvest()
    finally:
        q.stop()
    return state_totals


def test_session_window_state_evicts_as_sessions_close(
        spark, session_soak_dir, tmp_path):
    """Built-in session_window aggregate: open sessions live in state;
    the watermark must evict each batch's K sessions once the next
    batch's event time closes them."""
    closed = (N_BATCHES - 1) * KEYS_PER_BATCH  # final batch stays open
    agg = (spark.readStream.schema(_SCHEMA)
           .option("maxFilesPerTrigger", 1)
           .parquet(session_soak_dir)
           .withWatermark("ts", "30 minutes")
           .groupBy("user_id", F.session_window("ts", "30 minutes"))
           .agg(F.count("*").alias("n_events")))
    state = _soak(spark, agg, "soak_sw_out", str(tmp_path / "ck1"), closed)

    assert len(state) >= 20, sorted(state)  # real multi-batch soak
    out = spark.table("soak_sw_out")
    assert out.count() == closed
    assert out.filter(F.col("n_events") != EVENTS_PER_SESSION).count() == 0
    peak = max(state.values())
    assert peak <= 3 * KEYS_PER_BATCH, dict(sorted(state.items()))
    tail = [state[b] for b in sorted(state)[-3:]]
    assert all(v <= 3 * KEYS_PER_BATCH for v in tail), tail


def test_apply_in_pandas_with_state_evicts_on_timeout(
        spark, session_soak_dir, tmp_path):
    """Custom sessionizer (applyInPandasWithState + event-time
    timeout): state rows are per-user open sessions; the timeout path
    must flush and REMOVE them as the watermark passes last+gap —
    the state-bound that makes the operator deployable on an
    unbounded stream."""
    from us_flight_delay_data_pipeline_spark.streaming.sessions import (
        sessionize_stream)

    closed = (N_BATCHES - 1) * KEYS_PER_BATCH
    src = (spark.readStream.schema(_SCHEMA)
           .option("maxFilesPerTrigger", 1)
           .parquet(session_soak_dir))
    # 29-minute delay, NOT 30: event-time timeouts fire only when the
    # watermark STRICTLY exceeds last_event + gap (see sessions.py
    # docstring). With delay == gap and batches exactly 1 h apart the
    # watermark after batch i+1 ties batch i's timeout to the micro-
    # second, so eviction slips one extra batch and the final batch's
    # predecessor never flushes. One minute of slack breaks the tie.
    sess = sessionize_stream(src, gap_minutes=30, watermark="29 minutes")
    # state-store sizing: one Python round-trip per store per batch
    # (same rationale as stream_sessions_state_gated)
    conf = spark.conf
    old_parts = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions", "8")
    try:
        state = _soak(spark, sess, "soak_st_out", str(tmp_path / "ck2"),
                      closed)
    finally:
        conf.set("spark.sql.shuffle.partitions", old_parts)

    assert len(state) >= 20, sorted(state)
    out = spark.table("soak_st_out")
    assert out.count() == closed
    assert out.filter(F.col("n_events") != EVENTS_PER_SESSION).count() == 0
    # every emitted session spans exactly its 2 intra-batch minutes
    span = (F.unix_micros("session_end") - F.unix_micros("session_start"))
    assert out.filter(span != (EVENTS_PER_SESSION - 1) * 60_000_000) \
              .count() == 0
    peak = max(state.values())
    assert peak <= 3 * KEYS_PER_BATCH, dict(sorted(state.items()))
    tail = [state[b] for b in sorted(state)[-3:]]
    assert all(v <= 3 * KEYS_PER_BATCH for v in tail), tail
