"""Streaming equivalence tests (SURVEY.md §5 strategy 4): replaying
bronze through the streaming wrappers yields identical silver to the
batch path, and the watermarked window agg produces correct totals."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.flight_fixtures import dirty_bodies, encode_bodies, make_clean_rows
from us_flight_delay_data_pipeline_spark.plans.silver import silver_transform
from us_flight_delay_data_pipeline_spark.streaming.ingest import (
    ENVELOPE_SCHEMA, stream_envelope_source, stream_hourly_kpis,
    stream_silver, stream_silver_foreach_batch)


@pytest.fixture(scope="module")
def bronze_dir(spark, tmp_path_factory):
    """Producer drop directory: envelope parquet in several files
    (micro-batch grains)."""
    root = tmp_path_factory.mktemp("bronze")
    bodies = encode_bodies(make_clean_rows(120)) + dirty_bodies()
    rows = [(b, str(i % 4), i, None) for i, b in enumerate(bodies)]
    df = spark.createDataFrame(rows, ENVELOPE_SCHEMA) \
              .withColumn("enqueued_at", F.current_timestamp())
    df.repartition(4).write.mode("overwrite").parquet(str(root))
    return str(root)


def _batch_silver(spark, bronze_dir):
    return silver_transform(spark.read.parquet(bronze_dir))


def test_stream_silver_matches_batch(spark, bronze_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    src = stream_envelope_source(spark, bronze_dir, max_files_per_trigger=2)
    q = stream_silver(src, out, ckpt, available_now=True)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    want = _batch_silver(spark, bronze_dir)
    assert got.count() == want.count()
    a = got.agg(F.sum("arr_delay"), F.sum("arr_flights")).collect()[0]
    b = want.agg(F.sum("arr_delay"), F.sum("arr_flights")).collect()[0]
    assert a == b
    assert sorted(got.columns) == sorted(want.columns)


def test_foreach_batch_matches_batch(spark, bronze_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    src = stream_envelope_source(spark, bronze_dir, max_files_per_trigger=1)
    q = stream_silver_foreach_batch(src, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    want = _batch_silver(spark, bronze_dir)
    assert got.count() == want.count()
    assert got.agg(F.sum("arr_del15")).collect() == \
        want.agg(F.sum("arr_del15")).collect()


def test_stream_restart_is_incremental(spark, bronze_dir, tmp_path):
    """Checkpoint makes re-running with no new files a no-op (T3)."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    src = stream_envelope_source(spark, bronze_dir)
    stream_silver(src, out, ckpt, available_now=True).awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # restart against the same checkpoint: nothing new to process
    stream_silver(stream_envelope_source(spark, bronze_dir), out, ckpt,
                  available_now=True).awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_windowed_kpis(spark, bronze_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    src = stream_envelope_source(spark, bronze_dir)
    q = stream_hourly_kpis(src, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # append mode emits only watermark-closed windows; rows land in the
    # current hour so the window may still be open → 0 rows is legal,
    # but the schema contract must hold.
    assert sorted(got.columns) == sorted(
        ["window_start", "carrier", "total_arr_flights", "total_arr_del15"])


@pytest.mark.slow  # fast-profile exclusion (see pytest.ini)
def test_stream_dedup_drops_replays(spark, tmp_path):
    """At-least-once redelivery: the same bodies arrive twice across
    micro-batches; the watermarked dedup emits each exactly once."""
    from us_flight_delay_data_pipeline_spark.streaming.ingest import (
        stream_dedup_envelopes)
    src_dir = str(tmp_path / "src")
    bodies = encode_bodies(make_clean_rows(40))
    rows = [(b, "0", i, None) for i, b in enumerate(bodies)]
    df = spark.createDataFrame(rows, ENVELOPE_SCHEMA) \
              .withColumn("enqueued_at", F.current_timestamp())
    df.write.mode("overwrite").parquet(src_dir)
    df.write.mode("append").parquet(src_dir)  # the replay

    src = stream_envelope_source(spark, src_dir, max_files_per_trigger=2)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (stream_dedup_envelopes(src).writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == len(bodies)
    assert got.select("body_md5").distinct().count() == len(bodies)


def test_stream_restart_processes_only_new_files(spark, tmp_path):
    """Crash/deploy recovery with NEW data: wave 1 streams and stops;
    wave 2 lands; a restart against the same checkpoint processes
    ONLY wave 2 (no reprocessing, no loss) and the final silver
    equals the batch transform of both waves."""
    from pyspark.sql import functions as F
    from tests.flight_fixtures import encode_bodies, make_clean_rows

    src_dir = str(tmp_path / "bronze")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def land(rows, mode):
        bodies = encode_bodies(rows)
        df = spark.createDataFrame(
            [(b, str(i % 4), i, None) for i, b in enumerate(bodies)],
            ENVELOPE_SCHEMA).withColumn("enqueued_at",
                                        F.current_timestamp())
        df.repartition(2).write.mode(mode).parquet(src_dir)

    land(make_clean_rows(40, seed=1), "overwrite")
    stream_silver(stream_envelope_source(spark, src_dir), out, ckpt,
                  available_now=True).awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 == 40

    land(make_clean_rows(25, seed=2), "append")
    stream_silver(stream_envelope_source(spark, src_dir), out, ckpt,
                  available_now=True).awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 65  # 40 kept (not reprocessed) + 25 new
    want = silver_transform(spark.read.parquet(src_dir))
    assert got.agg(F.sum("arr_flights")).collect() == \
        want.agg(F.sum("arr_flights")).collect()
