"""Stream-stream join equivalence (SURVEY.md §2.10 — the capability
listed as "notably absent" in the reference): a watermarked
event-time-bounded inner join over complete input must produce
exactly the batch join's rows."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, StructField, StructType,
                               TimestampType)

from us_flight_delay_data_pipeline_spark.streaming.joins import (
    attribution_join_batch, stream_stream_attribution_join)

_SCHEMA = StructType([
    StructField("user_id", IntegerType(), True),
    StructField("ts", TimestampType(), True),
    StructField("event_id", IntegerType(), True),
])

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(u, _T0 + dt.timedelta(minutes=m), i) for u, m, i in rows], _SCHEMA)


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    """Views and purchases as multi-file parquet drop directories."""
    root = tmp_path_factory.mktemp("streams")
    views = _mk(spark, [
        (1, 0, 100), (1, 40, 101),   # user 1: two views
        (2, 5, 102),                 # user 2: one view
        (3, 10, 103),                # user 3: view, no purchase
    ])
    purchases = _mk(spark, [
        (1, 25, 200),   # within 30min of view 100, not of 101
        (1, 55, 201),   # within 30min of view 101 only
        (2, 50, 202),   # 45min after view 102 -> outside span
        (4, 20, 203),   # no view at all
    ])
    vdir, pdir = str(root / "views"), str(root / "purchases")
    views.repartition(2).write.parquet(vdir)
    purchases.repartition(2).write.parquet(pdir)
    return vdir, pdir


def _normalize(df):
    return sorted(tuple(r) for r in df.select(
        "user_id", F.col("view_id"), F.col("purchase_id")).collect())


def _select(joined, views, purchases):
    return joined.select(
        views["user_id"].alias("user_id"),
        views["event_id"].alias("view_id"),
        purchases["event_id"].alias("purchase_id"))


@pytest.mark.slow  # fast-profile exclusion (see pytest.ini)
def test_stream_stream_join_matches_batch(spark, dirs, tmp_path):
    vdir, pdir = dirs
    vs = spark.readStream.schema(_SCHEMA).parquet(vdir)
    ps = spark.readStream.schema(_SCHEMA).parquet(pdir)
    joined = stream_stream_attribution_join(
        vs, ps, on="user_id", left_ts="ts", right_ts="ts",
        watermark="10 minutes", max_span="30 minutes")
    out = _select(joined, vs, ps)
    q = (out.writeStream.format("memory").queryName("ssj")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in
                 spark.sql("SELECT * FROM ssj").collect())

    vb, pb = spark.read.parquet(vdir), spark.read.parquet(pdir)
    expected = _normalize(_select(
        attribution_join_batch(vb, pb, on="user_id", left_ts="ts",
                               right_ts="ts", max_span="30 minutes"),
        vb, pb))
    assert got == expected
    # semantic spot-checks: attribution window enforced
    assert (1, 100, 200) in got and (1, 101, 201) in got
    assert all(p != 202 for _, _, p in got)      # outside 30-min span
    assert all(u != 4 for u, _, _ in got)        # purchase without view


def test_stream_stream_join_plan_has_bounded_state(spark, dirs):
    """The physical plan must be a StreamingSymmetricHashJoin with
    watermarks on both sides (the bounded-state contract)."""
    vdir, pdir = dirs
    vs = spark.readStream.schema(_SCHEMA).parquet(vdir)
    ps = spark.readStream.schema(_SCHEMA).parquet(pdir)
    joined = stream_stream_attribution_join(
        vs, ps, on="user_id", left_ts="ts", right_ts="ts")
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
