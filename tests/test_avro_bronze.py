"""Real Avro bronze roundtrip (SURVEY.md §3 EP2; reference reads Event
Hubs Capture Avro in ETL/flight-silver-transformation (1).ipynb:574-578).

The spark-avro datasource is a separate artifact not bundled with pip
pyspark. When it is present (e.g. the driver container gains the jar),
this test exercises the REAL ``format("avro")`` write/read path through
``write_envelope_bronze`` / ``read_envelope_bronze`` byte-for-byte.
When absent, it SKIPS VISIBLY so the untested branch shows up in every
test report instead of silently never running (VERDICT r1 §missing #1).
"""

from __future__ import annotations

import pytest

from us_flight_delay_data_pipeline_spark.sources.envelope import (
    avro_available,
    decode_envelope,
    encode_envelope,
    read_envelope_bronze,
    write_envelope_bronze,
)


def test_avro_roundtrip_or_visible_skip(spark, tmp_path):
    if not avro_available(spark):
        pytest.skip(
            "spark-avro datasource not on classpath — avro bronze branch "
            "(sources/envelope.py:90,96) falls back to parquet and the "
            "format('avro') write/read path is UNTESTED in this container")
    src = spark.createDataFrame(
        [(1, "AA", 12.5), (2, "DL", None), (3, "UA", -3.0)],
        "flight_id int, carrier string, delay double")
    env = encode_envelope(src, produced_at=False)
    path = str(tmp_path / "bronze_avro")
    write_envelope_bronze(env, path, fmt="avro")
    back = read_envelope_bronze(spark, path, fmt="avro")
    assert sorted(back.columns) == sorted(env.columns)
    decoded = decode_envelope(back)
    bodies = sorted(r["body_str"] for r in decoded.select("body_str").collect())
    orig = sorted(r["body_str"] for r in
                  decode_envelope(env).select("body_str").collect())
    assert bodies == orig


def test_default_format_matches_probe(spark, tmp_path):
    """The fmt=None default resolves to avro iff the datasource is
    registered — pins that the fallback decision is probe-driven, not
    hardcoded, on every container."""
    src = spark.createDataFrame([(1, "x")], "id int, v string")
    env = encode_envelope(src, produced_at=False)
    path = str(tmp_path / "bronze_default")
    write_envelope_bronze(env, path)
    back = read_envelope_bronze(spark, path)
    assert back.count() == 1
    import glob
    ext = ".avro" if avro_available(spark) else ".parquet"
    assert glob.glob(path + "/*" + ext), (
        f"default bronze format should have produced {ext} files")
