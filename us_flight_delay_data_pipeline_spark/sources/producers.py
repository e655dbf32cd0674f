"""Producer replay (SURVEY.md EP1): the reference's two producers
re-expressed storage-agnostically.

The reference streams CSV rows as JSON messages to Event Hubs via the
Kafka protocol — a fast batched path with backpressure
(kafka-eh/produce_to_eventhub.py:55-107: produce + poll(0) + flush
every ``--batch``) and a slow one-row-per-interval path that stamps
``produced_at`` and can loop the file forever
(kafka-eh/produce_send_rows.py:10-39, 64-85). Locally the "broker" is
a drop directory of envelope parquet files that the streaming layer
tails (``stream_envelope_source``); on a cluster the same frames go to
``writeStream.format("kafka")`` unchanged.

Replay is a *driver-side* loop by design — it simulates an external
telemetry source, so it is the one place in the engine where
imperative Python is correct rather than a smell.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .envelope import csv_to_envelope_batch

__all__ = ["replay_csv_batched", "replay_rows_interval"]


def replay_csv_batched(spark: SparkSession, csv_path: str, drop_dir: str,
                       batch_size: int = 1000) -> int:
    """Fast path: the whole CSV → envelope frames, landed as one file
    per ``batch_size`` messages (the flush-every-N contract of
    produce_to_eventhub.py:92-95). Returns message count."""
    env = csv_to_envelope_batch(spark, csv_path)
    n = env.count()
    n_files = max(1, (n + batch_size - 1) // batch_size)
    env.repartition(n_files).write.mode("append").parquet(drop_dir)
    return n


def replay_rows_interval(spark: SparkSession, csv_path: str, drop_dir: str,
                         interval_s: float = 0.0, max_rows: int | None = None,
                         loop: bool = False) -> Iterator[int]:
    """Slow path: one row per ``interval_s`` seconds, each stamped with
    ``produced_at`` epoch seconds (produce_send_rows.py:76), optional
    ``loop`` re-reading the file forever (:37-39). Yields the running
    count after each row so callers (tests) can stop at will."""
    import csv

    sent = 0
    while True:
        with open(csv_path, newline="") as fh:
            for row in csv.DictReader(fh):
                payload = dict(row)
                payload["produced_at"] = int(time.time())
                body = json.dumps(payload).encode("utf-8")
                df = spark.createDataFrame(
                    [(body, "0", sent, None)],
                    "body binary, partition string, offset long, "
                    "enqueued_at timestamp")
                df = df.withColumn("enqueued_at", F.current_timestamp())
                df.write.mode("append").parquet(drop_dir)
                sent += 1
                yield sent
                if max_rows is not None and sent >= max_rows:
                    return
                if interval_s:
                    time.sleep(interval_s)
        if not loop:
            return
