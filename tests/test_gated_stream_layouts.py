"""Regression: gated streaming queries must read BOTH parquet table
layouts — ``{table}.parquet`` as a single file (driver testdata) and
as a directory of part files (standard Spark writer output, the 10x
scale copies, any production dataset).

The original ``_stream_source`` glob-filtered the parent directory for
a file literally named ``{table}.parquet``, which matches nothing when
the table is a directory — every gated stream silently drained ZERO
rows on directory-layout inputs (caught because the 10x scale bench
showed stream_dedup_watermark_gated "finishing" in 0.3 s).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.queries import load_registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dir_layout_sf(spark, tmp_path_factory):
    """A copy of the sf0.001 events table re-written as a multi-file
    parquet DIRECTORY named events.parquet (writer-standard layout)."""
    root = tmp_path_factory.mktemp("dirlayout")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.repartition(4).write.mode("overwrite") \
      .parquet(str(root / "events.parquet"))
    return str(root)


def test_gated_stream_reads_directory_layout(spark, dir_layout_sf):
    reg = load_registry()
    got = reg["stream_dedup_watermark_gated"].fn(spark, dir_layout_sf)
    want = (spark.read.parquet(f"{SF}/events.parquet")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n_unique_users")))
    g = {r["event_type"]: r["n_unique_users"] for r in got.collect()}
    w = {r["event_type"]: r["n_unique_users"] for r in want.collect()}
    assert g == w and sum(w.values()) > 0


def test_gated_stream_single_file_layout_unchanged(spark):
    reg = load_registry()
    got = reg["stream_dedup_watermark_gated"].fn(spark, SF)
    want = (spark.read.parquet(f"{SF}/events.parquet")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n_unique_users")))
    g = {r["event_type"]: r["n_unique_users"] for r in got.collect()}
    w = {r["event_type"]: r["n_unique_users"] for r in want.collect()}
    assert g == w and sum(w.values()) > 0
