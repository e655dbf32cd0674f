"""Table maintenance: small-file compaction and range-clustered
(sorted) layout — the operational half of a 100 TB lakehouse that the
reference delegates to Databricks/Snowflake (OPTIMIZE / clustering
keys) and never implements.

Why it matters at scale: streaming ingestion (5-minute Capture
windows, README.md:107) produces thousands of small files; scan cost
is dominated by per-file open/footer overhead and scheduling, not
bytes. Compaction rewrites partitions into ~target-sized files.
Range-clustering additionally sorts rows across files on chosen keys
so parquet min/max footer stats make selective scans skip whole
files (poor-man's Z-order for a single key prefix).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

__all__ = ["table_file_stats", "compact_parquet", "zorder_compact",
           "morton_interleave"]


def morton_interleave(x, y, bits: int = 8):
    """Morton (Z-order) bit interleave of two non-negative ``bits``-bit
    integer columns: x on even output bits, y on odd. Pure
    shift/and/or column expression (no UDF) — shared by
    zorder_compact (the rewrite) and zorder_layout_audit (the
    decision metric); queries/curation_wave7.py mirrors it in SQL for
    the DuckDB oracle."""
    from pyspark.sql import functions as F
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i) % 2, 2 * i)).bitwiseOR(
            F.shiftleft(F.shiftright(y, i) % 2, 2 * i + 1))
    return z


def table_file_stats(spark: SparkSession, path: str) -> dict:
    """File-count/byte stats for a parquet table (the before/after
    observability for compaction). Uses the Hadoop FileSystem API so
    it works on any supported storage, not just local paths."""
    df = spark.read.parquet(path)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    sizes = []
    for uri in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(uri)
        fs = p.getFileSystem(hconf)
        sizes.append(fs.getFileStatus(p).getLen())
    total = sum(sizes)
    return {
        "n_files": len(sizes),
        "total_bytes": total,
        "avg_file_bytes": total // max(1, len(sizes)),
    }


def compact_parquet(spark: SparkSession, in_path: str, out_path: str,
                    target_file_bytes: int = 128 * 1024 * 1024,
                    sort_cols: list[str] | None = None,
                    partition_by: list[str] | None = None) -> dict:
    """Rewrite a parquet table into ~``target_file_bytes`` files.

    - default: round-robin ``repartition`` (even file sizes);
    - with ``sort_cols``: ``repartitionByRange`` + ``sortWithin
      Partitions`` — globally range-clustered output whose per-file
      min/max footers are disjoint on the leading key, enabling
      file-level skipping for selective predicates;
    - with ``partition_by``: Hive-style directory partitioning on top.

    Returns before/after file stats. The file-count estimate assumes
    parquet re-encodes to roughly the input's compressed density —
    good enough for maintenance sizing (AQE cannot help here: the
    write fan-in is decided by the explicit repartition).
    """
    before = table_file_stats(spark, in_path)
    df: DataFrame = spark.read.parquet(in_path)
    n_files = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
    if sort_cols:
        df = (df.repartitionByRange(n_files, *sort_cols)
                .sortWithinPartitions(*sort_cols))
    else:
        df = df.repartition(n_files)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_path)
    after = table_file_stats(spark, out_path)
    return {"before": before, "after": after}


def zorder_compact(spark: SparkSession, in_path: str, out_path: str,
                   cols: tuple[str, str], bits: int = 8,
                   n_files: int = 16) -> dict:
    """Two-dimensional Z-order clustering (the Delta OPTIMIZE ZORDER
    idea in plain Spark): each clustering column is monotonically
    bucketed to ``2^bits`` levels between its min and max, the two
    bucket ids are Morton bit-interleaved into one key, and the table
    is rewritten range-partitioned + sorted on that key.

    Result: every output file covers a small rectangle of the
    (a, b) value space, so parquet min/max footers prune files for
    selective predicates on EITHER column — a linear sort can only
    prune its leading column. Pure shift/and/or expressions, one
    repartitionByRange shuffle; the min/max pre-pass is a single
    cheap aggregate (at 100 TB use persisted column stats instead).

    Clustering columns must be NUMERIC (asserted); rows with a NULL
    clustering value bucket to 0 explicitly — Spark's ``least()``
    ignores NULLs, so without the coalesce a NULL would silently land
    in the TOP bucket (levels-1) and cluster with the max of the value
    range instead of a deliberate edge.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import NumericType

    a, b = cols
    df = spark.read.parquet(in_path)
    for c in (a, b):
        if not isinstance(df.schema[c].dataType, NumericType):
            raise TypeError(
                f"zorder_compact clustering column {c!r} must be numeric, "
                f"got {df.schema[c].dataType.simpleString()}")
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(a), F.max(a), F.min(b), F.max(b)).collect()[0]
    if lo_a is None:  # all-NULL column: any constant span works
        lo_a, hi_a = 0, 1
    if lo_b is None:
        lo_b, hi_b = 0, 1
    levels = 1 << bits

    def bucket(c, lo, hi):
        # monotone scale to [0, levels); floor keeps it integer-exact;
        # NULL -> dedicated bucket 0 (least() would ignore the NULL
        # and emit levels-1, silently clustering NULLs with the max)
        span = float(hi - lo) or 1.0
        scaled = F.least(
            F.lit(levels - 1),
            F.floor((F.col(c) - F.lit(lo)) * levels / F.lit(span))
             .cast("bigint"))
        return F.coalesce(scaled, F.lit(0).cast("bigint"))

    xa, xb = bucket(a, lo_a, hi_a), bucket(b, lo_b, hi_b)
    z = morton_interleave(xa, xb, bits)
    (df.withColumn("_z", z)
       .repartitionByRange(n_files, F.col("_z"))
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(out_path))
    return table_file_stats(spark, out_path)
