"""MERGE-style upsert tests: update-on-match / insert-on-miss
semantics, and partition-confined rewrites for the incremental-refresh
path (only touched partitions change on disk)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.operators.upsert import (
    merge_upsert, upsert_partitioned_parquet)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, part string, v double")


def test_merge_upsert_semantics(spark):
    target = _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)])
    updates = _df(spark, [(2, "a", 20.0), (4, "b", 40.0)])
    got = {(r.k, r.part, r.v)
           for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {(1, "a", 1.0), (2, "a", 20.0), (3, "b", 3.0),
                   (4, "b", 40.0)}


def test_partitioned_upsert_rewrites_only_touched_partitions(
        spark, tmp_path):
    path = str(tmp_path / "t")
    _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0),
                (5, "c", 5.0)]) \
        .write.partitionBy("part").parquet(path)
    untouched_files = set(os.listdir(os.path.join(path, "part=c")))

    updates = _df(spark, [(2, "a", 20.0), (6, "b", 60.0)])
    upsert_partitioned_parquet(spark, path, updates, ["k"], "part")

    got = {(r.k, r.part, r.v)
           for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a", 1.0), (2, "a", 20.0), (3, "b", 3.0),
                   (6, "b", 60.0), (5, "c", 5.0)}
    # the 'c' partition was neither read nor rewritten
    assert set(os.listdir(os.path.join(path, "part=c"))) == untouched_files


def test_upsert_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    _df(spark, [(1, "a", 1.0), (2, "a", 2.0)]) \
        .write.partitionBy("part").parquet(path)
    updates = _df(spark, [(2, "a", 20.0)])
    upsert_partitioned_parquet(spark, path, updates, ["k"], "part")
    upsert_partitioned_parquet(spark, path, updates, ["k"], "part")
    got = spark.read.parquet(path)
    assert got.count() == 2
    assert got.filter(F.col("k") == 2).collect()[0].v == 20.0


def test_upsert_many_touched_partitions_no_driver_collect(spark, tmp_path):
    """The round-2 rewrite replaced the driver-side collect of touched
    partition values with a broadcast semi-join prune; this drives the
    scenario that motivated it — a delta touching MANY partitions —
    and checks untouched partitions survive byte-identically."""
    from pyspark.sql import functions as F
    from us_flight_delay_data_pipeline_spark.operators.upsert import (
        upsert_partitioned_parquet,
    )
    path = str(tmp_path / "t")
    base = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") % 50).alias("part"),
        F.lit("old").alias("v"))
    base.write.partitionBy("part").parquet(path)
    # delta touches 40 of 50 partitions: update half the keys, add new
    updates = spark.range(0, 160, 2).select(
        F.col("id").alias("k"),
        (F.col("id") % 50).alias("part"),
        F.lit("new").alias("v")).filter(F.col("part") < 40)
    upsert_partitioned_parquet(spark, path, updates, keys=["k"],
                               partition_col="part")
    got = spark.read.parquet(path)
    upd_keys = {r.k for r in updates.collect()}
    for r in got.collect():
        expect = "new" if r.k in upd_keys else "old"
        assert r.v == expect, (r.k, r.part, r.v)
    # untouched partitions (part >= 40) still fully present and old
    assert got.filter("part >= 40").count() == \
        base.filter("part >= 40").count()
    assert got.filter("part >= 40 and v != 'old'").count() == 0
