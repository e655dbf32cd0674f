"""RocksDB state-store backend parity: the HDFSBackedStateStore
default keeps streaming state on the JVM heap — fine locally, but at
100 TB state volumes the production backend is RocksDBStateStoreProvider
(bundled with Spark 4: off-heap, incremental-checkpoint, spill-free).
A state BACKEND must never change query RESULTS; these pin that the
stateful gated pipelines return identical values under both
providers."""

from __future__ import annotations

import math

import pytest

from us_flight_delay_data_pipeline_spark.queries import load_registry

REGISTRY = load_registry()

_ROCKS = ("org.apache.spark.sql.execution.streaming.state."
          "RocksDBStateStoreProvider")
_KEY = "spark.sql.streaming.stateStore.providerClass"

# one query per stateful-operator family: windowed agg (complete),
# stateful dedup, watermarked stream-stream join
STATEFUL_SAMPLE = [
    "stream_hourly_kpis_gated",
    "stream_dedup_gated",
    "stream_stream_join_gated",
]


def _canon(df):
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()

    def cell(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else v
        return v

    return sorted([tuple(cell(r[c]) for c in cols) for r in rows],
                  key=repr)


@pytest.mark.parametrize("name", STATEFUL_SAMPLE)
def test_rocksdb_state_store_value_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    base = _canon(spec.fn(spark, sf_dir))
    old = spark.conf.get(_KEY, None)
    spark.conf.set(_KEY, _ROCKS)
    try:
        rocks = _canon(spec.fn(spark, sf_dir))
    finally:
        if old:
            spark.conf.set(_KEY, old)
        else:
            spark.conf.unset(_KEY)
    assert base == rocks, f"{name}: result depends on state backend"
