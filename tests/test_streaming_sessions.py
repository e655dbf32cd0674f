"""Stateful-streaming equivalence: ``sessionize_stream``
(applyInPandasWithState) vs the batch lag/cumsum sessionizer on the
same events, replayed as a time-ordered multi-file stream so state
must survive micro-batch boundaries."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType, TimestampType)

from tests.conftest import SF_DIR
from us_flight_delay_data_pipeline_spark.queries.sessions_and_ann import (
    SESSION_GAP_MIN, sessionize_events)
from us_flight_delay_data_pipeline_spark.streaming.sessions import (
    sessionize_stream)

STREAM_SCHEMA = StructType([
    StructField("event_id", LongType(), True),
    StructField("ts", TimestampType(), True),
    StructField("user_id", LongType(), True),
    StructField("event_type", StringType(), True),
    StructField("value", DoubleType(), True),
])


@pytest.fixture(scope="module")
def replay_dir(spark, tmp_path_factory):
    """events sorted by ts, written as 3 sequential slices (increasing
    mtime → FileStreamSource replays them oldest-first), so every
    user's session state crosses batch boundaries."""
    root = tmp_path_factory.mktemp("events_replay")
    from us_flight_delay_data_pipeline_spark.sources.registry import load_table
    ev = (load_table(spark, SF_DIR, "events")
          .select("event_id", "ts", "user_id", "event_type", "value")
          .orderBy("ts", "event_id").toPandas())
    k = 3
    n = len(ev)
    for i in range(k):
        # micros, not pandas-default nanos: the session reads
        # TIMESTAMP(NANOS) as long (nanosAsLong) and would type-clash
        ev.iloc[i * n // k:(i + 1) * n // k].to_parquet(
            str(root / f"slice_{i:03d}.parquet"), index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True)
        time.sleep(0.1)  # distinct mtimes → deterministic replay order
    return str(root)


def _closed_sessions_batch(spark):
    """All batch sessions except each user's last (the only ones a
    NoTimeout stream can have emitted by end-of-input)."""
    s = sessionize_events(spark, SF_DIR)
    last = s.groupBy("user_id").agg(F.max("session_idx").alias("last_idx"))
    return (s.join(last, "user_id")
             .filter(F.col("session_idx") < F.col("last_idx"))
             .select("user_id", "session_start", "session_end",
                     "n_events", "total_value"))


def _run_stream(spark, replay_dir, out_dir, ckpt, watermark):
    src = (spark.readStream.format("parquet").schema(STREAM_SCHEMA)
           .option("maxFilesPerTrigger", 1).load(replay_dir))
    sessions = sessionize_stream(src, gap_minutes=SESSION_GAP_MIN,
                                 watermark=watermark)
    q = (sessions.writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.read.schema(
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, total_value double").parquet(out_dir)


def test_stream_sessions_match_batch_closed(spark, replay_dir, tmp_path):
    got = _run_stream(spark, replay_dir, str(tmp_path / "out"),
                      str(tmp_path / "ckpt"), watermark=None)
    want = _closed_sessions_batch(spark)
    key = ["user_id", "session_start"]
    assert got.count() == want.count()
    # exact per-session equality (join on identity, compare payloads)
    joined = got.alias("g").join(want.alias("w"), key, "full_outer")
    mismatches = joined.filter(
        F.col("g.n_events").isNull() | F.col("w.n_events").isNull()
        | (F.col("g.n_events") != F.col("w.n_events"))
        | (F.col("g.session_end") != F.col("w.session_end"))
        | (F.abs(F.col("g.total_value") - F.col("w.total_value")) > 1e-9))
    assert mismatches.count() == 0


def test_stream_sessions_timeout_flush(spark, replay_dir, tmp_path):
    """With an event-time timeout, the stream may additionally flush
    final sessions whose (last event + gap) fell behind the watermark:
    emitted must be a superset of the in-stream-closed set and a
    subset of the full batch session set, with identical payloads."""
    got = _run_stream(spark, replay_dir, str(tmp_path / "out"),
                      str(tmp_path / "ckpt"), watermark="1 minute")
    all_sessions = sessionize_events(spark, SF_DIR).select(
        "user_id", "session_start", "session_end", "n_events", "total_value")
    closed = _closed_sessions_batch(spark)
    key = ["user_id", "session_start"]
    assert got.count() >= closed.count()
    # every emitted session appears in the batch result with the same payload
    extra = (got.alias("g").join(all_sessions.alias("w"), key, "left_outer")
             .filter(F.col("w.n_events").isNull()
                     | (F.col("g.n_events") != F.col("w.n_events"))
                     | (F.col("g.session_end") != F.col("w.session_end"))))
    assert extra.count() == 0
    # and nothing emitted twice
    assert got.groupBy(*key).count().filter("count > 1").count() == 0
