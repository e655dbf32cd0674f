"""Streaming MERGE sink: replaying versioned micro-batches through
``stream_upsert`` must converge to latest-version-per-key, with only
touched partitions rewritten."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

from us_flight_delay_data_pipeline_spark.streaming.ingest import stream_upsert

_SCHEMA = StructType([
    StructField("k", LongType(), True),
    StructField("part", StringType(), True),
    StructField("val", IntegerType(), True),
    StructField("seq", LongType(), True),
])


@pytest.fixture()
def waves_dir(spark, tmp_path):
    """Two waves of updates as separate files with increasing mtimes
    so the file stream replays them in order."""
    drop = tmp_path / "drop"
    drop.mkdir()
    wave1 = [(1, "a", 10, 1), (2, "a", 20, 2), (3, "b", 30, 3),
             (3, "b", 31, 4)]          # in-batch duplicate key 3
    wave2 = [(2, "a", 99, 5), (4, "c", 40, 6)]  # update k=2, insert k=4
    for i, wave in enumerate([wave1, wave2]):
        f = str(drop / f"wave{i}")
        spark.createDataFrame(wave, _SCHEMA).coalesce(1).write.parquet(f)
        t = time.time() - 100 + i * 10
        for root, _, names in os.walk(f):
            for name in names:
                os.utime(os.path.join(root, name), (t, t))
    return str(drop / "wave*")


def test_stream_upsert_converges_to_latest(spark, waves_dir, tmp_path):
    table = str(tmp_path / "table")
    src = (spark.readStream.schema(_SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(waves_dir))
    q = stream_upsert(src, table, str(tmp_path / "ckpt"),
                      keys=["k"], partition_col="part",
                      dedup_order_col="seq")
    q.awaitTermination(120)
    got = {r.k: (r.part, r.val) for r in spark.read.parquet(table).collect()}
    assert got == {1: ("a", 10), 2: ("a", 99), 3: ("b", 31), 4: ("c", 40)}
    # hive layout on the partition column
    parts = {d for d in os.listdir(table) if d.startswith("part=")}
    assert parts == {"part=a", "part=b", "part=c"}
