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


def test_triangles_per_node_hand_graph(spark):
    """Hand-computed fixture: K4 plus a pendant vertex and a disjoint
    edge. K4 members sit in C(3,2)=3 triangles each; the pendant and
    the disjoint pair sit in none."""
    from us_flight_delay_data_pipeline_spark.operators.graph import (
        triangles_per_node)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
             (4, 5),                                          # pendant
             (8, 9)]                                          # disjoint
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r["node"]: (r["d"], r["n_tri"])
           for r in triangles_per_node(df).collect()}
    assert out == {1: (3, 3), 2: (3, 3), 3: (3, 3), 4: (4, 3),
                   5: (1, 0), 8: (1, 0), 9: (1, 0)}
