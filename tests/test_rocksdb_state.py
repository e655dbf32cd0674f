"""RocksDB state store backend (bundled with Spark 4) — the state
backend a 100 TB streaming deployment actually runs.

The default HDFSBackedStateStoreProvider keeps every state row on the
executor JVM heap (bounded only by ``minDeltasForSnapshot`` GC), so
state-heavy operators (dedup keys, session windows, stream-stream
join buffers) are heap-limited. RocksDB keeps state off-heap on local
disk with incremental checkpointing — state size scales with disk,
not heap. These tests pin that the engine's stateful operators run
unmodified on the RocksDB provider and produce identical results,
and that the provider is actually engaged (rocksdb custom metrics in
progress), so switching the backend at deployment is a pure config
change, not a code change.
"""

from __future__ import annotations

import glob
import os
import shutil
from datetime import datetime, timedelta, timezone

import pytest

# Long-running state-soak / backend-equivalence integration tests:
# excluded from the fast default profile (see pytest.ini); run with -m "".
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType, TimestampType)

ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"

_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
])

N_BATCHES = 6
KEYS_PER_BATCH = 50


@pytest.fixture(scope="module")
def batch_files(spark, tmp_path_factory):
    """One parquet file per micro-batch, 1 h apart, 3-event sessions
    per key (same shape as the session soak, smaller)."""
    root = tmp_path_factory.mktemp("rocks_src")
    flat = tmp_path_factory.mktemp("rocks_flat")
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    eid = 0
    for i in range(N_BATCHES):
        base = t0 + timedelta(hours=i)
        rows = []
        for k in range(KEYS_PER_BATCH):
            uid = i * 1000 + k
            for j in range(3):
                rows.append((eid, uid, base + timedelta(minutes=j), 1.0))
                eid += 1
        df = spark.createDataFrame(rows, _SCHEMA).coalesce(1)
        df.write.mode("overwrite").parquet(str(root / f"b{i:04d}"))
        [part] = glob.glob(str(root / f"b{i:04d}" / "part-*.parquet"))
        dst = str(flat / f"f{i:04d}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(flat)


def _drain(spark, plan, name, ckpt, provider=None):
    conf = spark.conf
    old = conf.get(_PROVIDER_CONF, None)
    if provider:
        conf.set(_PROVIDER_CONF, provider)
    try:
        q = (plan.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        progress = list(q.recentProgress)
    finally:
        if provider:
            if old is None:
                conf.unset(_PROVIDER_CONF)
            else:
                conf.set(_PROVIDER_CONF, old)
    return spark.table(name), progress


def _session_plan(spark, src_dir):
    return (spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .withWatermark("ts", "30 minutes")
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total_value")))


def test_rocksdb_provider_matches_default_backend(
        spark, batch_files, tmp_path):
    """Identical session-window results on HDFS-backed vs RocksDB
    state stores — backend choice is a config, not a semantics,
    decision."""
    base, _ = _drain(spark, _session_plan(spark, batch_files),
                     "rocks_base_out", str(tmp_path / "ck_base"))
    rocks, progress = _drain(spark, _session_plan(spark, batch_files),
                             "rocks_rdb_out", str(tmp_path / "ck_rdb"),
                             provider=ROCKSDB)

    key = lambda r: (r["user_id"], r["session_window"]["start"])  # noqa: E731
    b = {key(r): (r["n_events"], r["total_value"])
         for r in base.collect()}
    r = {key(r): (r["n_events"], r["total_value"])
         for r in rocks.collect()}
    assert b == r
    assert len(r) == (N_BATCHES - 1) * KEYS_PER_BATCH

    # the RocksDB provider must actually have been engaged: its
    # stateOperators progress carries rocksdb* custom metrics the
    # HDFS-backed provider does not emit
    rocks_metrics = [
        m for p in progress for op in (p.get("stateOperators") or [])
        for m in (op.get("customMetrics") or {})]
    assert any(m.startswith("rocksdb") for m in rocks_metrics), \
        sorted(set(rocks_metrics))[:20]


def test_rocksdb_provider_runs_dedup_within_watermark(
        spark, batch_files, tmp_path):
    """dropDuplicatesWithinWatermark (the bounded-state streaming
    dedup) on RocksDB: same distinct count as batch."""
    plan = (spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 2)
            .parquet(batch_files)
            .withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["user_id"]))
    out, progress = _drain(spark, plan, "rocks_dedup_out",
                           str(tmp_path / "ck_dd"), provider=ROCKSDB)
    want = N_BATCHES * KEYS_PER_BATCH  # user ids unique per batch
    assert out.select("user_id").distinct().count() == want
    rocks_metrics = [
        m for p in progress for op in (p.get("stateOperators") or [])
        for m in (op.get("customMetrics") or {})]
    assert any(m.startswith("rocksdb") for m in rocks_metrics)
