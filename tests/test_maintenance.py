"""Compaction / range-clustered layout tests: row preservation, file
count reduction, and the data-skipping property (disjoint per-file
min/max footers on the clustering key)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.operators.maintenance import (
    compact_parquet, table_file_stats)


@pytest.fixture(scope="module")
def fragmented(spark, sf_dir, tmp_path_factory):
    """lineitem shattered into many small files (streaming-ingest
    aftermath)."""
    src = str(tmp_path_factory.mktemp("frag") / "lineitem")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.repartition(64).write.parquet(src)
    return src, li.count()


def test_compaction_reduces_files_preserves_rows(spark, fragmented, tmp_path):
    src, n_rows = fragmented
    out = str(tmp_path / "compacted")
    stats = compact_parquet(spark, src, out, target_file_bytes=16 * 1024 * 1024)
    assert stats["before"]["n_files"] == 64
    assert stats["after"]["n_files"] < 8
    assert spark.read.parquet(out).count() == n_rows
    assert stats["after"]["total_bytes"] > 0


def test_range_clustered_layout_skips_files(spark, fragmented, tmp_path):
    src, n_rows = fragmented
    out = str(tmp_path / "clustered")
    quarter = max(1, table_file_stats(spark, src)["total_bytes"] // 4)
    compact_parquet(spark, src, out, target_file_bytes=quarter,
                    sort_cols=["l_shipdate"])
    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    assert len(files) >= 3
    # per-file [min,max] ranges on the clustering key must be disjoint
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("l_shipdate")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min); maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo
    assert spark.read.parquet(out).count() == n_rows


def test_file_stats_shape(spark, fragmented):
    src, _ = fragmented
    st = table_file_stats(spark, src)
    assert st["n_files"] == 64
    assert st["avg_file_bytes"] * 64 <= st["total_bytes"] + 64
