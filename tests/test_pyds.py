"""Custom Python DataSource connector (sources/pyds.py): batch
partition-per-file parallelism, corrupt-line dropping, and the
SimpleDataSourceStreamReader micro-batch tail of a growing drop
directory."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.sources.pyds import (
    JsonlEnvelopeDataSource)


def _write_file(path, rows):
    with open(path, "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _mk_drop(tmp_path, n_files=3, rows_per=4):
    d = tmp_path / "drop"
    d.mkdir()
    expect = []
    for i in range(n_files):
        rows = [{"doc_id": i * 100 + j, "lang": "en" if j % 2 else "de",
                 "source": f"s{i}", "n_chars": 10 * j + 1}
                for j in range(rows_per)]
        expect.extend(rows)
        _write_file(str(d / f"wave-{i:04d}.jsonl"), rows)
    return str(d), expect


def test_batch_read_partition_per_file(spark, tmp_path):
    drop, expect = _mk_drop(tmp_path)
    spark.dataSource.register(JsonlEnvelopeDataSource)
    df = spark.read.format("sg_jsonl_envelope").option("path", drop).load()
    assert df.rdd.getNumPartitions() == 3  # one InputPartition per file
    got = {r.doc_id: (r.lang, r.source, r.n_chars) for r in df.collect()}
    assert got == {e["doc_id"]: (e["lang"], e["source"], e["n_chars"])
                   for e in expect}


def test_corrupt_lines_dropped_not_fatal(spark, tmp_path):
    d = tmp_path / "drop2"
    d.mkdir()
    with open(str(d / "f.jsonl"), "w") as fh:
        fh.write(json.dumps({"doc_id": 1, "lang": "en", "source": "s",
                             "n_chars": 5}) + "\n")
        fh.write("{truncated-garbage\n")
        fh.write("\n")
        fh.write(json.dumps({"doc_id": 2, "lang": "de", "source": "s",
                             "n_chars": 7}) + "\n")
    spark.dataSource.register(JsonlEnvelopeDataSource)
    df = spark.read.format("sg_jsonl_envelope") \
        .option("path", str(d)).load()
    assert sorted(r.doc_id for r in df.collect()) == [1, 2]


def test_stream_tails_new_files(spark, tmp_path):
    """The stream reader's offset is a file index: files that appear
    after the stream starts are picked up by later micro-batches,
    and every row lands exactly once."""
    drop, expect = _mk_drop(tmp_path, n_files=2)
    spark.dataSource.register(JsonlEnvelopeDataSource)
    src = (spark.readStream.format("sg_jsonl_envelope")
           .option("path", drop).load())
    name = "pyds_stream_sink"
    ckpt = str(tmp_path / "ckpt")
    q = (src.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ckpt)
         .trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 60

        def rows():
            return spark.table(name).count()

        while rows() < len(expect) and time.time() < deadline:
            time.sleep(0.5)
        assert rows() == len(expect)
        # a third wave lands AFTER the stream started
        wave = [{"doc_id": 900 + j, "lang": "fr", "source": "late",
                 "n_chars": j} for j in range(3)]
        _write_file(os.path.join(drop, "wave-9999.jsonl"), wave)
        while rows() < len(expect) + 3 and time.time() < deadline:
            time.sleep(0.5)
        got = spark.table(name)
        assert got.count() == len(expect) + 3  # exactly once, no dups
        assert got.filter(F.col("source") == "late").count() == 3
    finally:
        q.stop()


def test_replay_reads_committed_file_list_not_interval(tmp_path):
    """Exactly-once replay: readBetweenOffsets must re-read EXACTLY the
    files the committed batch consumed (end offset's "files" list). A
    late file that lands INSIDE an already-committed name interval is
    absent from the original batch, so the replay must not include it
    either — the name-interval rescan would silently duplicate it."""
    from us_flight_delay_data_pipeline_spark.sources.pyds import (
        _JsonlStreamReader)
    d = tmp_path / "drop3"
    d.mkdir()
    _write_file(str(d / "wave-0001.jsonl"), [{"doc_id": 1, "lang": "en",
                                              "source": "s", "n_chars": 1}])
    _write_file(str(d / "wave-0005.jsonl"), [{"doc_id": 5, "lang": "en",
                                              "source": "s", "n_chars": 5}])
    r = _JsonlStreamReader({"path": str(d)})
    start = r.initialOffset()
    rows, end = r.read(start)
    assert sorted(x[0] for x in rows) == [1, 5]
    assert end["files"] == ["wave-0001.jsonl", "wave-0005.jsonl"]
    # a late producer drops a file INSIDE the committed interval
    _write_file(str(d / "wave-0003.jsonl"), [{"doc_id": 3, "lang": "en",
                                              "source": "late",
                                              "n_chars": 3}])
    replayed = sorted(x[0] for x in r.readBetweenOffsets(start, end))
    assert replayed == [1, 5]  # NOT [1, 3, 5]
    # the next live batch does not re-deliver past names either
    rows2, end2 = r.read(end)
    assert list(rows2) == []  # wave-0003 sorts before last: skipped
    # legacy checkpoint (no "files") degrades to the interval scan
    legacy_end = {"last": end["last"]}
    legacy = sorted(x[0] for x in r.readBetweenOffsets(start, legacy_end))
    assert legacy == [1, 3, 5]
