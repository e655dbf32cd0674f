"""Property test: BOTH connected-components operators (min-label
propagation and large/small-star) against a pure-Python union-find
model over random edge lists. Small node domains force dense
multi-edge graphs, self-loops, and chains — the shapes where a
rewiring bug shows as a merged or split component."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from us_flight_delay_data_pipeline_spark.operators.components import (
    connected_components, connected_components_star)

NODES = st.integers(min_value=0, max_value=12)
EDGES = st.lists(st.tuples(NODES, NODES), min_size=1, max_size=24)


def _model(edges):
    """Union-find ground truth: node -> min node id of its component,
    over every node appearing in the edge list (a self-loop-only node
    is its own singleton component — both operators' contract)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
        if a == b:
            parent.setdefault(a, a)
            continue
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@pytest.mark.slow  # fast-profile exclusion (see pytest.ini)
@given(edges=EDGES)
def test_both_operators_match_union_find(spark, edges):
    expected = _model(edges)
    df = spark.createDataFrame(edges, "src int, dst int")
    got_label = {(r.node, r.component)
                 for r in connected_components(df).collect()}
    got_star = {(r.node, r.component)
                for r in connected_components_star(df).collect()}
    want = set(expected.items())
    assert got_label == want
    assert got_star == want
