"""Property test for the banded interval overlap join
(operators/intervals.py::interval_overlap_pairs). Small key/time
domains force the edge cases: intervals touching exactly at an
endpoint (closed => overlap_sec 0 row, open => dropped), starts
straddling a bucket boundary, lengths exactly at the band bound, and
pairs whose starts are a full bucket apart. Expected pairs come from
a brute-force python model; equality is exact (pair set + overlap
seconds), which pins the exactly-once-per-pair property of the
3-bucket probe."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.operators.intervals import (
    interval_overlap_pairs,
)

_T0 = datetime.datetime(2024, 1, 1)
_W = 60  # bucket width / max interval length (seconds)


def _ts(sec: int) -> datetime.datetime:
    return _T0 + datetime.timedelta(seconds=sec)


ROWS = st.lists(
    st.tuples(st.integers(0, 1),          # key
              st.integers(0, 3 * _W),     # start offset (spans 4 buckets)
              st.integers(0, _W)),        # length <= band bound
    min_size=1, max_size=10)


def _model(rows, closed):
    out = {}
    for i, (ka, sa, la) in enumerate(rows):
        for j, (kb, sb, lb) in enumerate(rows):
            if i >= j or ka != kb:
                continue
            ea, eb = sa + la, sb + lb
            hit = (sa <= eb and sb <= ea) if closed \
                else (sa < eb and sb < ea)
            if hit:
                out[(i, j)] = min(ea, eb) - max(sa, sb)
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=ROWS, closed=st.booleans())
def test_matches_bruteforce_model(spark, rows, closed):
    df = spark.createDataFrame(
        [(k, i, _ts(s), _ts(s + ln)) for i, (k, s, ln) in enumerate(rows)],
        "k int, rid int, s timestamp, e timestamp")
    got = {
        (r[f"a_rid"], r[f"b_rid"]): r["overlap_sec"]
        for r in interval_overlap_pairs(
            df, on="k", start="s", end="e", id_col="rid",
            max_len_sec=_W, closed=closed).collect()
    }
    assert got == _model(rows, closed)


def test_rejects_over_length_interval(spark):
    df = spark.createDataFrame(
        [(0, 0, _ts(0), _ts(2 * _W))],
        "k int, rid int, s timestamp, e timestamp")
    with pytest.raises(Exception, match="interval longer"):
        interval_overlap_pairs(df, on="k", start="s", end="e",
                               id_col="rid", max_len_sec=_W).collect()


def test_plan_is_equi_join(spark):
    """The join must plan as a hash/sort-merge equi join on
    (key, bucket) — never a nested loop over the key alone."""
    df = spark.createDataFrame(
        [(0, i, _ts(i * 10), _ts(i * 10 + 30)) for i in range(6)],
        "k int, rid int, s timestamp, e timestamp")
    plan = interval_overlap_pairs(
        df, on="k", start="s", end="e", id_col="rid",
        max_len_sec=_W)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
