"""Property-based tests (SURVEY.md §5 strategy 3) with hypothesis:
invariants of the gold KPI pipeline over generated flight rows —
bounds on safe-divide ratios, cause-pct normalization, cross-grain
re-aggregation consistency, and invariance under repartitioning.

One Spark job per generated dataset is expensive, so examples are
capped low; the generator hits the edge cases that matter (zero
denominators, all-cause-zero rows, single-carrier batches).
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.flight_fixtures import encode_bodies
from us_flight_delay_data_pipeline_spark.plans.gold import (
    agg_carrier, agg_monthly, derive_kpis)
from us_flight_delay_data_pipeline_spark.plans.silver import silver_transform
from us_flight_delay_data_pipeline_spark.streaming.ingest import ENVELOPE_SCHEMA

CARRIERS = [("AA", "American"), ("WN", "Southwest"), ("DL", "Delta")]


@st.composite
def flight_rows(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    rows = []
    for i in range(n):
        carrier, name = draw(st.sampled_from(CARRIERS))
        flights = draw(st.integers(min_value=0, max_value=50))
        del15 = draw(st.integers(min_value=0, max_value=flights or 1))
        causes = [draw(st.integers(min_value=0, max_value=9))
                  for _ in range(5)]
        rows.append({
            "year": str(draw(st.integers(2023, 2024))),
            "month": str(draw(st.integers(1, 12))),
            "carrier": carrier, "carrier_name": name,
            "airport": "JFK", "airport_name": "JFK Intl",
            "arr_flights": f"{flights}.00",
            "arr_del15": f"{del15}.00",
            "carrier_ct": f"{causes[0]}.00",
            "weather_ct": f"{causes[1]}.00",
            "nas_ct": f"{causes[2]}.00",
            "security_ct": f"{causes[3]}.00",
            "late_aircraft_ct": f"{causes[4]}.00",
            "arr_cancelled": str(draw(st.integers(0, 5))),
            "arr_diverted": str(draw(st.integers(0, 3))),
            "arr_delay": f"{draw(st.integers(0, 900))}.00",
            "carrier_delay": "10.00",
        })
    return rows


def _gold_inputs(spark, rows):
    bodies = encode_bodies(rows)
    env = spark.createDataFrame(
        [(b, "0", i, None) for i, b in enumerate(bodies)], ENVELOPE_SCHEMA)
    return derive_kpis(silver_transform(env))


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(rows=flight_rows())
def test_kpi_bounds_and_pct_normalization(spark, rows):
    kpi = _gold_inputs(spark, rows).collect()
    assert len(kpi) == len(rows)
    for r in kpi:
        # ratios are CASE-WHEN-0 guarded: defined, finite, >= 0
        assert r["delay_rate"] is not None and r["delay_rate"] >= 0
        if r["arr_flights"] == 0:
            assert r["delay_rate"] == 0  # the NULLIF/CASE contract
        pcts = [r[f"{c}_pct"] for c in
                ("carrier_ct", "weather_ct", "nas_ct", "security_ct",
                 "late_aircraft_ct")]
        assert all(p is not None and 0 <= p <= 1 + 1e-9 for p in pcts)
        if r["cause_total"] and r["cause_total"] > 0:
            assert abs(sum(pcts) - 1.0) < 1e-9
        else:
            assert all(p == 0 for p in pcts)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@pytest.mark.slow  # fast-profile exclusion (see pytest.ini)
@given(rows=flight_rows())
def test_cross_grain_reaggregation_consistency(spark, rows):
    """sum over GOLD_CARRIER groups == GOLD_MONTHLY totals == silver
    totals (associativity of the sum tree, whatever the grain)."""
    kpi = _gold_inputs(spark, rows)
    carrier = agg_carrier(kpi)
    monthly = agg_monthly(kpi)
    t0 = kpi.agg(F.sum("arr_flights"), F.sum("arr_del15")).collect()[0]
    t1 = carrier.agg(F.sum("total_arr_flights"),
                     F.sum("total_arr_del15")).collect()[0]
    t2 = monthly.agg(F.sum("total_arr_flights"),
                     F.sum("total_arr_del15")).collect()[0]
    assert tuple(t0) == tuple(t1) == tuple(t2)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@pytest.mark.slow  # fast-profile exclusion (see pytest.ini)
@given(rows=flight_rows(), parts=st.integers(min_value=1, max_value=7))
def test_gold_invariant_under_repartitioning(spark, rows, parts):
    """The physical partitioning must never change gold results."""
    kpi = _gold_inputs(spark, rows)
    base = {tuple(r) for r in agg_monthly(kpi).collect()}
    shuffled = {tuple(r)
                for r in agg_monthly(kpi.repartition(parts)).collect()}
    assert base == shuffled


def test_pretrain_funnel_stage_invariants(spark, sf_dir):
    """Funnel semantics: every stage only drops documents (docs and
    tokens non-increasing), stages are labeled densely, and the base
    row matches the corpus size."""
    from us_flight_delay_data_pipeline_spark.plans.pretrain import (
        pretrain_funnel)
    from us_flight_delay_data_pipeline_spark.sources.registry import (
        load_table)
    docs = load_table(spark, sf_dir, "documents")
    rows = {r.stage_idx: r for r in pretrain_funnel(docs).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4, 5]
    assert rows[0].n_docs == docs.count()
    for i in range(1, 6):
        assert rows[i].n_docs <= rows[i - 1].n_docs
        assert rows[i].n_tokens <= rows[i - 1].n_tokens
    assert rows[5].n_docs > 0  # the pipeline keeps something
