"""SCD2 history semantics: superseded current rows close with the new
version's effective timestamp, new versions become current, untouched
keys and already-closed history pass through byte-identical."""

from __future__ import annotations

import datetime as dt

import pytest

from us_flight_delay_data_pipeline_spark.operators.upsert import scd2_apply

_T = dt.datetime


@pytest.fixture()
def history(spark):
    rows = [
        # key, attr, valid_from, valid_to, is_current
        (1, "bronze", _T(2024, 1, 1), _T(2024, 3, 1), False),
        (1, "silver", _T(2024, 3, 1), None, True),
        (2, "gold", _T(2024, 2, 1), None, True),
        (3, "bronze", _T(2024, 1, 15), None, True),
    ]
    return spark.createDataFrame(
        rows, "k int, tier string, valid_from timestamp, "
              "valid_to timestamp, is_current boolean")


def test_scd2_closes_and_appends(spark, history):
    updates = spark.createDataFrame(
        [(1, "gold", _T(2024, 6, 1)), (4, "bronze", _T(2024, 6, 1))],
        "k int, tier string, effective_at timestamp")
    out = scd2_apply(history, updates, key="k", effective_col="effective_at")
    rows = {(r.k, r.tier): r for r in out.collect()}
    assert len(rows) == 6

    # superseded current row closed at the new effective ts
    closed = rows[(1, "silver")]
    assert closed.valid_to == _T(2024, 6, 1) and not closed.is_current
    # new version is current and open-ended
    new = rows[(1, "gold")]
    assert new.valid_from == _T(2024, 6, 1)
    assert new.valid_to is None and new.is_current
    # brand-new key appends as current
    assert rows[(4, "bronze")].is_current
    # untouched keys and closed history pass through unchanged
    assert rows[(2, "gold")].is_current
    assert rows[(2, "gold")].valid_to is None
    assert rows[(1, "bronze")].valid_to == _T(2024, 3, 1)
    assert rows[(3, "bronze")].is_current


def test_scd2_exactly_one_current_per_key(spark, history):
    updates = spark.createDataFrame(
        [(1, "plat", _T(2024, 7, 1)), (2, "plat", _T(2024, 7, 1)),
         (3, "plat", _T(2024, 7, 1))],
        "k int, tier string, effective_at timestamp")
    out = scd2_apply(history, updates, key="k", effective_col="effective_at")
    from pyspark.sql import functions as F
    per_key = (out.filter("is_current")
                  .groupBy("k").count().collect())
    assert all(r["count"] == 1 for r in per_key)
    assert {r.k for r in per_key} == {1, 2, 3}
    # interval chaining: every closed row's valid_to equals some later
    # row's valid_from for the same key
    closed = out.filter(~F.col("is_current")).collect()
    opens = {(r.k, r.valid_from) for r in out.collect()}
    for r in closed:
        assert (r.k, r.valid_to) in opens
