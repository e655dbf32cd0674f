"""Structured Streaming layer (SURVEY.md §2.10 T1-T5).

The reference *declares* an Event Hubs stream source
(ETL/flight-silver-transformation (1).ipynb:230-239) with a 1-minute
micro-batch trigger (:181) and a checkpoint path (:180), but its
executed path is batch re-reads of captured Avro — i.e. incremental
batch. We mirror that honestly (SURVEY.md §2.10): the batch
``silver_transform`` is THE transform, and streaming is a thin
wrapper that either

- applies it directly to a file-source stream (Spark file sources
  give exactly-once semantics with checkpointing — the local stand-in
  for Kafka/Event Hubs; swap ``format("parquet")`` for
  ``format("kafka")`` + the same downstream plan on a cluster), or
- replays it through ``foreachBatch`` (the pattern the reference's
  notebook implies), which guarantees stream/batch equivalence by
  construction.

Beyond parity, ``stream_hourly_kpis`` adds what the reference's
"real-time" framing implies but never ships (README.md:15-17,
281-283): watermarked event-time tumbling windows with late-data
tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType, TimestampType)

from ..plans.silver import silver_transform

__all__ = [
    "ENVELOPE_SCHEMA", "stream_envelope_source", "stream_silver",
    "stream_silver_foreach_batch", "stream_hourly_kpis",
]

# Envelope-at-rest schema (what encode_envelope writes).
ENVELOPE_SCHEMA = StructType([
    StructField("body", BinaryType(), True),
    StructField("partition", StringType(), True),
    StructField("offset", LongType(), True),
    StructField("enqueued_at", TimestampType(), True),
])


def stream_envelope_source(spark: SparkSession, drop_dir: str,
                           fmt: str = "parquet",
                           max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a producer drop directory (the local
    stand-in for the Kafka/Event Hubs topic, S4). ``maxFilesPerTrigger``
    is the micro-batch sizing knob (T2's analog for file sources)."""
    reader = (spark.readStream.format(fmt).schema(ENVELOPE_SCHEMA))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(drop_dir)


def stream_silver(envelopes: DataFrame, out_path: str, checkpoint: str,
                  trigger: str | None = None,
                  available_now: bool = False) -> StreamingQuery:
    """Envelope stream → silver parquet sink with checkpointing
    (T1+T2+T3). The transform is literally the batch function —
    identical logical plan per micro-batch."""
    silver = silver_transform(envelopes)
    writer = (silver.writeStream.format("parquet")
              .option("path", out_path)
              .option("checkpointLocation", checkpoint)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger:
        writer = writer.trigger(processingTime=trigger)
    return writer.start()


def stream_silver_foreach_batch(envelopes: DataFrame, out_path: str,
                                checkpoint: str,
                                available_now: bool = True) -> StreamingQuery:
    """The reference's implied pattern: ``foreachBatch`` reusing the
    batch silver function per micro-batch (SURVEY.md EP2 'Ours'),
    appending to the silver table. Useful when the sink needs
    batch-only features (Delta MERGE, JDBC, ...)."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        silver_transform(batch_df).write.mode("append").parquet(out_path)

    writer = (envelopes.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_hourly_kpis(envelopes: DataFrame, out_path: str, checkpoint: str,
                       watermark: str = "2 hours",
                       window: str = "1 hour") -> StreamingQuery:
    """Watermarked event-time tumbling-window aggregation (T4/T5 plus
    the watermark capability the reference lacks).

    Event time = ``enqueued_at`` (the producer stamps ``produced_at``
    inside the payload; the envelope timestamp is the broker-side
    equivalent and avoids a JSON parse before the window). Late rows
    beyond the watermark are dropped by Spark's state cleanup — state
    size stays bounded at arbitrary stream length, which is what makes
    this safe on an unbounded 100 TB/day feed."""
    silver = silver_transform(
        envelopes.withWatermark("enqueued_at", watermark),
        keep_cols=("enqueued_at",))
    agg = (silver
           .groupBy(F.window("enqueued_at", window).alias("win"),
                    F.col("carrier"))
           .agg(F.sum("arr_flights").alias("total_arr_flights"),
                F.sum("arr_del15").alias("total_arr_del15"))
           .select(F.col("win.start").alias("window_start"),
                   "carrier", "total_arr_flights", "total_arr_del15"))
    return (agg.writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())


def stream_dedup_envelopes(envelopes: DataFrame,
                           watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: drop envelope replays (at-least-once
    sources redeliver) keyed on the body hash, with state bounded by
    the event-time watermark — ``dropDuplicatesWithinWatermark`` keeps
    a key in state only until the watermark passes it, so an unbounded
    stream can't grow unbounded dedup state. The batch twin is
    ``operators.dedup.dedup_exact`` (same md5-of-body key)."""
    keyed = envelopes.withColumn("body_md5", F.md5(F.col("body"))) \
                     .withWatermark("enqueued_at", watermark)
    return keyed.dropDuplicatesWithinWatermark(["body_md5"])


def stream_upsert(stream_df: DataFrame, table_path: str, checkpoint: str,
                  keys: list[str], partition_col: str,
                  dedup_order_col: str | None = None,
                  available_now: bool = True) -> StreamingQuery:
    """Streaming MERGE sink: each micro-batch upserts into a
    Hive-partitioned parquet table via ``foreachBatch`` +
    :func:`~..operators.upsert.upsert_partitioned_parquet` — the
    Structured Streaming half of the reference's aspirational
    incremental refresh (README.md:281-302; Auto Loader + MERGE on
    Databricks, Streams+Tasks on Snowflake).

    ``dedup_order_col``: when a micro-batch can carry several versions
    of one key, keep only the highest value of this column per key
    (e.g. an offset) — MERGE requires unique update keys. Exactly-once
    note: foreachBatch may re-run a batch on recovery; upserts are
    idempotent per (key, value), so replays converge to the same
    table.
    """
    from ..operators.upsert import upsert_partitioned_parquet

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        updates = batch_df
        if dedup_order_col is not None:
            from pyspark.sql.window import Window
            w = Window.partitionBy(*keys).orderBy(F.desc(dedup_order_col))
            updates = (updates.withColumn("__rn", F.row_number().over(w))
                              .filter(F.col("__rn") == 1).drop("__rn"))
        spark = batch_df.sparkSession
        try:
            spark.read.parquet(table_path).schema
            exists = True
        except Exception:
            exists = False
        if not exists:
            (updates.write.mode("overwrite").partitionBy(partition_col)
                    .parquet(table_path))
        else:
            upsert_partitioned_parquet(spark, table_path, updates, keys,
                                       partition_col)

    writer = (stream_df.writeStream.foreachBatch(_apply)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_socket_json_source(spark: SparkSession, host: str,
                              port: int) -> DataFrame:
    """Network-transport streaming source (the closest local analog of
    the reference's Kafka-protocol Event Hubs ingestion,
    kafka-eh/produce_to_eventhub.py:55-107, without a broker): Spark's
    TCP socket source reads newline-delimited JSON messages and wraps
    each into the same binary-``body`` envelope the file-drop and
    (on a cluster) Kafka sources produce, so the entire downstream
    silver pipeline is transport-agnostic. Socket offers no replay /
    offsets — production uses Kafka; this covers the wire-ingest code
    path (message framing -> envelope) end to end."""
    lines = (spark.readStream.format("socket")
             .option("host", host).option("port", port).load())
    # offset synthesized from the message hash (monotonically_
    # increasing_id is not allowed on streaming frames; a real broker
    # source carries its own offset column)
    return lines.select(
        F.encode(F.col("value"), "UTF-8").alias("body"),
        F.lit(0).alias("partition"),
        F.abs(F.xxhash64(F.col("value"))).alias("offset"),
        F.current_timestamp().alias("enqueued_at"))


def stream_txlog_sink(df: DataFrame, table_path: str, checkpoint: str,
                      query_id: str = "txsink",
                      available_now: bool = True) -> StreamingQuery:
    """Streaming sink into a transaction-log table with END-TO-END
    exactly-once semantics: each micro-batch commits through
    ``TxTable.commit_once`` with token ``{query_id}/{batch_id}``, so a
    foreachBatch replay after a crash is a no-op instead of a
    duplicate append (operators/txlog.py; pinned directly by
    tests/test_txlog.py::test_foreach_batch_replay_via_commit_once).
    Readers get snapshot isolation and time travel over the streamed
    table for free — the txlog upgrade of the plain parquet appends
    in ``stream_silver_foreach_batch``."""
    from ..operators.txlog import TxTable

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        TxTable(batch_df.sparkSession, table_path).commit_once(
            batch_df, token=f"{query_id}/{batch_id}")

    writer = (df.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
