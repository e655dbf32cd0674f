"""Property test for the degree-ordered triangle census
(operators/graph.py::triangle_count). Random small multigraphs force
the edge cases: duplicate input edges (must dedup), self-loops (must
drop), reversed duplicates (a-b and b-a are one edge), hub nodes
(degree-orientation tiebreaks), and triangle-free graphs (clustering
NULL when wedge-free). Expected census from a brute-force model."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from us_flight_delay_data_pipeline_spark.operators.graph import (
    triangle_count,
)

EDGES = st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                 min_size=1, max_size=15)


def _model(raw):
    es = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    nodes = {n for e in es for n in e}
    deg = {n: sum(n in e for e in es) for n in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tris = sum(1 for a, b, c in combinations(sorted(nodes), 3)
               if {(a, b), (a, c), (b, c)} <= es)
    clustering = 3.0 * tris / wedges if wedges > 0 else None
    return (len(nodes), len(es), wedges, tris, clustering)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(raw=EDGES)
def test_matches_bruteforce_model(spark, raw):
    df = spark.createDataFrame(raw, "a long, b long")
    row = triangle_count(df).collect()
    if not {(min(a, b), max(a, b)) for a, b in raw if a != b}:
        # all input edges were self-loops: empty graph, empty census
        assert row == [] or row[0]["n_edges"] == 0
        return
    r = row[0]
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"],
            r["clustering"]) == _model(raw)
