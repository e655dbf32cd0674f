"""Custom PYTHON DataSource connector (Spark 4 `pyspark.sql.datasource`
API) — the extension surface for sources Spark has no built-in reader
for (proprietary feeds, REST paginators, message-bus snapshots). The
reference's ingestion edge is exactly such a feed (Event Hubs via the
Kafka protocol, kafka-eh/produce_to_eventhub.py); locally the stand-in
wire format is newline-delimited JSON envelope files, and this module
implements a first-class *connector* for it rather than a per-query
parse:

- :class:`JsonlEnvelopeDataSource` — batch reader. One
  ``InputPartition`` per file, so a directory of N files scans with N
  parallel Python tasks (the same partition-parallelism contract as a
  JVM FileScan); each task yields typed rows, not raw strings.
- :class:`_JsonlStreamReader` — SimpleDataSourceStreamReader: offsets
  are file indexes into the sorted directory listing, each microbatch
  reads the files that appeared since the last offset (the tailing
  contract of the drop-dir "broker" in sources/producers.py).

Registration is per-session::

    spark.dataSource.register(JsonlEnvelopeDataSource)
    df = (spark.read.format("sg_jsonl_envelope")
          .option("path", drop_dir).load())

Scale notes: partitions() runs on the DRIVER and lists the directory
(metadata-scale); row reading runs in executors' Python workers with
Arrow-batched returns. A Python source is the SLOW path relative to a
JVM FileScan (no codegen, no vectorized decode) — it exists for
format coverage, not as the hot path; the oracle-gated query pins its
semantics, and the JVM envelope reader (sources/envelope.py) remains
the performance path for formats Spark can read natively.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)

__all__ = ["JsonlEnvelopeDataSource"]

_SCHEMA = "doc_id bigint, lang string, source string, n_chars bigint"


def _list_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if not f.startswith(("_", ".")) and not f.endswith(".crc"))


def _parse_lines(path: str):
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            try:
                o = json.loads(line)
            except ValueError:
                continue  # corrupt record: drop (the na.drop contract)
            yield (o.get("doc_id"), o.get("lang"), o.get("source"),
                   o.get("n_chars"))


class _JsonlBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sg_jsonl_envelope requires option 'path'")

    def partitions(self):
        # driver-side, metadata-scale: one partition per file so the
        # scan parallelism equals the file count
        return [InputPartition(p) for p in _list_files(self.path)]

    def read(self, partition):
        yield from _parse_lines(partition.value)


class _JsonlStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch tail of the drop directory.

    Offset contract: ``{"last": <basename>}`` — the lexicographically
    greatest file name consumed so far ("" before any). A batch
    consumes every file whose basename sorts strictly after ``last``,
    so replaying (start, end) re-reads exactly the files in that name
    interval (deterministic replay — the property exactly-once sinks
    build on). Producers MUST drop files with monotonically
    increasing names (timestamp/sequence prefixes — what every
    log-rotation and Kafka-connect file sink emits); a late file that
    sorts before ``last`` is deterministically skipped, never a
    silent re-read/skip shift (the failure mode of a positional
    index offset into a mutating sorted listing).
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sg_jsonl_envelope requires option 'path'")

    @staticmethod
    def _name(p: str) -> str:
        return os.path.basename(p)

    def initialOffset(self):
        return {"last": ""}

    def read(self, start):
        files = [p for p in _list_files(self.path)
                 if self._name(p) > start["last"]]
        rows = []
        for p in files:
            rows.extend(_parse_lines(p))
        new_last = self._name(files[-1]) if files else start["last"]
        return iter(rows), {"last": new_last}

    def readBetweenOffsets(self, start, end):
        rows = []
        for p in _list_files(self.path):
            if start["last"] < self._name(p) <= end["last"]:
                rows.extend(_parse_lines(p))
        return iter(rows)


class JsonlEnvelopeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sg_jsonl_envelope"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema):
        return _JsonlBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _JsonlStreamReader(self.options)
