"""Property test for the sorted-merge as-of join (operators/asof.py::
asof_join_sorted — the round-2 rewrite that replaced the join+filter
fan-out). Random keys/timestamps with SMALL domains force the edge
cases the TPC-H-shaped oracle rarely hits: right rows exactly at the
left timestamp (<= must match), several right rows on one timestamp
(tiebreak -> max), left rows with no preceding right row (inner
semantics: dropped), and multiple left rows between right updates
(carry-forward). Expected values come from a brute-force python
model."""

from __future__ import annotations

import pytest

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from us_flight_delay_data_pipeline_spark.operators.asof import (
    asof_join_sorted,
)

_T0 = datetime.datetime(2024, 1, 1)


def _ts(i: int) -> datetime.datetime:
    return _T0 + datetime.timedelta(minutes=i)


KEYS = st.integers(min_value=0, max_value=2)
TIMES = st.integers(min_value=0, max_value=5)

LEFT = st.lists(st.tuples(KEYS, TIMES), min_size=1, max_size=8)
RIGHT = st.lists(st.tuples(KEYS, TIMES, st.integers(0, 99)),
                 min_size=1, max_size=8)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@pytest.mark.slow  # fast-profile exclusion (see pytest.ini)
@given(left=LEFT, right=RIGHT)
def test_matches_bruteforce_model(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t) in enumerate(left)],
        "k int, lt timestamp, lid int")
    rdf = spark.createDataFrame(
        [(k, _ts(t), v) for k, t, v in right],
        "k int, rt timestamp, val int")
    got = {
        r.lid: r.asof_val
        for r in asof_join_sorted(ldf, rdf, on="k", left_time="lt",
                                  right_time="rt",
                                  value_cols=["val"]).collect()
    }
    expect = {}
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for rk, rt, v in right if rk == k and rt <= t]
        if cands:
            tmax = max(rt for rt, _ in cands)
            # ties on the right timestamp resolve to the max tiebreak
            # (default tiebreak = first value col)
            expect[i] = max(v for rt, v in cands if rt == tmax)
    assert got == expect, (left, right)
