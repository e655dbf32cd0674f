"""Source/sink format parity: the engine must round-trip its tables
through every bundled columnar/row format without value drift —
Parquet is the canonical store, but a complete engine ingests ORC,
JSON-lines, and CSV (SURVEY.md §2.1 scans/sinks)."""

from __future__ import annotations

import pytest

from us_flight_delay_data_pipeline_spark.sources.registry import load_table


def _canon(df):
    cols = sorted(df.columns)
    return sorted([tuple(r[c] for c in cols)
                   for r in df.select(*cols).collect()], key=repr)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_orc_roundtrip(docs, tmp_path):
    path = str(tmp_path / "docs_orc")
    docs.write.orc(path)
    back = docs.sparkSession.read.orc(path)
    assert back.schema == docs.schema
    assert _canon(back) == _canon(docs)


def test_jsonl_roundtrip(docs, tmp_path):
    """JSON-lines keeps arbitrary text (newlines escaped per spec);
    schema is re-imposed on read (JSON has no int width)."""
    path = str(tmp_path / "docs_jsonl")
    docs.write.json(path)
    back = docs.sparkSession.read.schema(docs.schema).json(path)
    assert _canon(back) == _canon(docs)


def test_csv_roundtrip_quoted_multiline(docs, tmp_path):
    """CSV with quoting + multiLine read: document text contains
    commas/quotes/newlines — exactly what naive CSV handling
    corrupts silently."""
    path = str(tmp_path / "docs_csv")
    (docs.write.option("header", True).option("quoteAll", True)
         .option("escape", '"').csv(path))
    back = (docs.sparkSession.read.schema(docs.schema)
            .option("header", True).option("multiLine", True)
            .option("escape", '"').csv(path))
    assert _canon(back) == _canon(docs)
