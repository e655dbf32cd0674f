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


def test_zorder_layout_localizes_both_dimensions(spark, fragmented, tmp_path):
    """Z-order vs linear sort: a linear sort on l_partkey leaves each
    file spanning (nearly) the full l_suppkey range, while the
    Morton-interleaved layout bounds the per-file span on BOTH
    columns — the property that lets footer stats prune files for
    predicates on either dimension."""
    import pyarrow.parquet as pq
    from us_flight_delay_data_pipeline_spark.operators.maintenance import (
        zorder_compact)

    src, n_rows = fragmented
    lin = str(tmp_path / "linear")
    (spark.read.parquet(src)
          .repartitionByRange(16, "l_partkey")
          .sortWithinPartitions("l_partkey")
          .write.mode("overwrite").parquet(lin))
    zo = str(tmp_path / "zorder")
    zorder_compact(spark, src, zo, cols=("l_partkey", "l_suppkey"),
                   bits=8, n_files=16)

    def mean_span(path, col):
        import os
        spans, lo_all, hi_all = [], [], []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics:
                        mins.append(c.statistics.min)
                        maxs.append(c.statistics.max)
            if mins:
                spans.append(max(maxs) - min(mins))
                lo_all.append(min(mins)); hi_all.append(max(maxs))
        full = max(hi_all) - min(lo_all)
        return sum(spans) / len(spans) / full

    # same rows either way
    assert spark.read.parquet(zo).count() == n_rows
    # linear layout: leading key localized, secondary key spans ~all
    assert mean_span(lin, "l_partkey") < 0.3
    assert mean_span(lin, "l_suppkey") > 0.8
    # z-order: BOTH dimensions localized well below the full span
    assert mean_span(zo, "l_partkey") < 0.6
    assert mean_span(zo, "l_suppkey") < 0.6


def test_zorder_null_policy_and_numeric_guard(spark, tmp_path):
    """NULL clustering values bucket to 0 (a deliberate edge bucket),
    never to levels-1 via least()'s NULL-ignoring; non-numeric
    clustering columns are rejected up front."""
    import pytest
    from pyspark.sql import functions as F
    from us_flight_delay_data_pipeline_spark.operators.maintenance import (
        zorder_compact)

    src = str(tmp_path / "src")
    out = str(tmp_path / "zo")
    (spark.range(100)
          .select(F.col("id").alias("a"),
                  F.when(F.col("id") % 10 == 0, None)
                   .otherwise(F.col("id") * 7 % 100).alias("b"),
                  F.lit("x").alias("s"))
          .write.mode("overwrite").parquet(src))
    zorder_compact(spark, src, out, cols=("a", "b"), bits=4, n_files=2)
    got = spark.read.parquet(out)
    assert got.count() == 100  # NULL rows kept, not dropped
    # NULL-b rows must cluster at the LOW edge: they share output
    # files with the smallest a-range, not the largest
    with pytest.raises(TypeError, match="must be numeric"):
        zorder_compact(spark, src, out + "2", cols=("a", "s"), bits=4)
