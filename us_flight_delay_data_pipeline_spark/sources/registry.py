"""Table registry over the driver testdata (and any parquet lake).

Maps the reference's mount/catalog plumbing (SURVEY.md §2.1 S6 —
``dbutils.fs.mount`` of blob containers) onto plain paths: a table is
``{dir}/{name}.parquet``. Column pruning and predicate pushdown reach
the parquet scan for free because we return the raw ``spark.read``
DataFrame and let callers compose filters declaratively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

__all__ = ["TABLES", "load_table", "load_all", "register_views"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain ``spark.read.parquet`` — no caching, no
    eager action, so Catalyst can prune columns/partitions per query.

    The ``events`` table's ``ts`` physical type has varied across
    testdata generations — TIMESTAMP(NANOS) (reads as long nanos
    under ``spark.sql.legacy.parquet.nanosAsLong``) and plain
    timestamp[us] without UTC adjustment (reads as TIMESTAMP_NTZ).
    Both are normalized here to a session-tz (UTC) TIMESTAMP so
    downstream ``unix_micros``/range-frame logic sees one type, and
    the instant equals DuckDB's naive read of the same file."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_event_ts(df)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize a ``ts`` column to UTC TIMESTAMP regardless of the
    physical parquet type (shared by the batch scan above and the
    streaming readers, which must apply the identical rewrite so
    stream/batch equivalence holds)."""
    from pyspark.sql import functions as F
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        t = field.dataType.simpleString()
        if t == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif t == "timestamp_ntz":
            # Session tz is pinned to UTC, so this cast reinterprets the
            # wall-clock as the same UTC instant (no shift).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries
    (the reference's warehouse layer, SURVEY.md §2 EP3) run unchanged."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
