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
  carry the greatest consumed basename plus the batch's exact file
  list; each microbatch reads the files that appeared since the last
  offset and replay re-reads exactly the committed list (the tailing
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

    Offset contract: ``{"last": <basename>, "files": [<basenames>]}``
    — ``last`` is the lexicographically greatest file name consumed so
    far ("" before any) and ``files`` is the exact list of basenames
    this batch consumed. A batch consumes every file whose basename
    sorts strictly after ``last``; replay of (start, end) re-reads
    exactly ``end["files"]`` — NOT a re-listing of the name interval —
    so a late file that lands inside an already-committed interval
    after the fact cannot be silently duplicated into the replayed
    batch (the original batch never saw it, so the replay must not
    either). Offsets from older checkpoints without ``files`` degrade
    to the name-interval scan.

    Producer requirements (documented contract, asserted nowhere —
    this is a tailing source, not a transactional log):

    - names must be monotonically increasing in LEXICOGRAPHIC order —
      numeric sequence names must be zero-padded (unpadded ``9.jsonl``
      sorts after ``10.jsonl`` and the latter is permanently skipped);
      timestamp/sequence prefixes as emitted by log-rotation and
      Kafka-connect file sinks satisfy this;
    - a late file whose name sorts before ``last`` is
      deterministically skipped, never a silent re-read/skip shift
      (the failure mode of a positional index offset into a mutating
      sorted listing).
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sg_jsonl_envelope requires option 'path'")

    @staticmethod
    def _name(p: str) -> str:
        return os.path.basename(p)

    def initialOffset(self):
        return {"last": "", "files": []}

    def read(self, start):
        files = [p for p in _list_files(self.path)
                 if self._name(p) > start["last"]]
        rows = []
        for p in files:
            rows.extend(_parse_lines(p))
        new_last = self._name(files[-1]) if files else start["last"]
        return iter(rows), {"last": new_last,
                            "files": [self._name(p) for p in files]}

    def readBetweenOffsets(self, start, end):
        consumed = end.get("files")
        if consumed is None:
            # pre-"files" checkpoint: degrade to the name-interval
            # scan (exact only if no late file landed in-interval)
            consumed = [self._name(p) for p in _list_files(self.path)
                        if start["last"] < self._name(p) <= end["last"]]
        rows = []
        for name in consumed:
            rows.extend(_parse_lines(os.path.join(self.path, name)))
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
