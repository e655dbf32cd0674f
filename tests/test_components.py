"""Unit tests for the connected-components operator on adversarial
graph shapes (the oracle-gated dedup_clusters query covers the
realistic near-dup graphs; these pin the algorithm itself)."""

from __future__ import annotations

import pytest

from us_flight_delay_data_pipeline_spark.operators.components import (
    connected_components)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = connected_components(df, **kw).collect()
    return {r.node: r.component for r in rows}


@pytest.mark.slow  # fast-profile exclusion (see pytest.ini)
def test_path_graph_worst_case_diameter(spark):
    """A 20-node path: min label must walk the full diameter — the
    worst case for min-label propagation."""
    edges = [(i, i + 1) for i in range(19)]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(20)}


def test_disjoint_cliques_and_direction_independence(spark):
    """Two components; labels must be the component-min regardless of
    the direction pairs were emitted in."""
    edges = [(5, 3), (3, 4), (10, 12), (11, 10)]
    got = _cc(spark, edges)
    assert got == {3: 3, 4: 3, 5: 3, 10: 10, 11: 10, 12: 10}


def test_self_loops_and_duplicate_edges(spark):
    edges = [(1, 1), (1, 2), (2, 1), (1, 2)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1}


def test_max_iter_exhaustion_raises_not_wrong_labels(spark):
    """A path longer than max_iter rounds is still mid-propagation at
    the cap; returning those labels would be silently wrong (node 9
    would not carry component-min 0 after 1 round). The operator must
    raise loudly instead of returning inconsistent labels."""
    edges = [(i, i + 1) for i in range(9)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, edges, max_iter=1)


def test_max_iter_exhaustion_star_raises(spark):
    """Same contract for the star variant: a non-fixpoint edge set at
    max_iter must raise, never emit conflicting (node, component)
    rows from a non-star-forest edge set."""
    from us_flight_delay_data_pipeline_spark.operators.components import (
        connected_components_star)
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components_star(df, max_iter=1).collect()


def test_auto_falls_back_to_star_beyond_min_label_budget(spark):
    """connected_components_auto on a path longer than the min-label
    round budget must transparently fall back to the star variant and
    return the correct labeling (the dedup_clusters default path)."""
    from us_flight_delay_data_pipeline_spark.operators.components import (
        connected_components_auto)
    edges = [(i, i + 1) for i in range(9)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = connected_components_auto(df, max_iter=1).collect()
    assert {r.node: r.component for r in rows} == {i: 0 for i in range(10)}


def test_long_path_converges_under_star_default_budget(spark):
    """The 'diameter unknown' escape hatch: a 60-node path (diameter
    59, far beyond min-label's 25-round default) converges under the
    star variant's O(log^2 n) default budget."""
    from us_flight_delay_data_pipeline_spark.operators.components import (
        connected_components_star)
    edges = [(i, i + 1) for i in range(59)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = connected_components_star(df).collect()
    assert {r.node: r.component for r in rows} == {i: 0 for i in range(60)}


def test_labels_invariant_under_partitioning(spark):
    """Distributed correctness: the component labeling must not depend
    on how the edge list is partitioned (min-label propagation is
    order-free, localCheckpoint must not leak partitioning into the
    result)."""
    import random
    rng = random.Random(7)
    # three chains + isolated pairs, shuffled
    edges = ([(i, i + 1) for i in range(0, 8)]
             + [(i, i + 1) for i in range(100, 110)]
             + [(500, 501), (600, 601), (601, 600)])
    rng.shuffle(edges)
    df1 = spark.createDataFrame(edges, "src bigint, dst bigint").coalesce(1)
    df8 = spark.createDataFrame(edges, "src bigint, dst bigint").repartition(8)
    m1 = {r.node: r.component for r in connected_components(df1).collect()}
    m8 = {r.node: r.component for r in connected_components(df8).collect()}
    assert m1 == m8
    assert m1[8] == 0 and m1[109] == 100 and m1[601] == 600


def test_star_equals_min_label_on_random_graph(spark):
    import random
    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    df = spark.createDataFrame(edges, ["src", "dst"]).filter("src != dst")
    from us_flight_delay_data_pipeline_spark.operators.components import (
        connected_components, connected_components_star)
    a = {(r.node, r.component)
         for r in connected_components(df).collect()}
    b = {(r.node, r.component)
         for r in connected_components_star(df).collect()}
    assert a == b


def test_star_collapses_long_path_quickly(spark):
    """A 64-node path has diameter 63 — min-label needs ~63 rounds;
    large/small-star must finish well inside its 40-round guard and
    label every node with the path minimum."""
    from us_flight_delay_data_pipeline_spark.operators.components import \
        connected_components_star
    n = 64
    df = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                               ["src", "dst"])
    rows = connected_components_star(df, max_iter=12).collect()
    assert len(rows) == n
    assert all(r.component == 0 for r in rows)


def test_star_two_components_and_self_loops(spark):
    from us_flight_delay_data_pipeline_spark.operators.components import \
        connected_components_star
    df = spark.createDataFrame(
        [(5, 6), (6, 7), (9, 9), (10, 11), (11, 10)], ["src", "dst"])
    got = {(r.node, r.component)
           for r in connected_components_star(df).collect()}
    # self-loop-only node 9 is its own singleton component — same
    # contract as the min-label operator (pinned by the union-find
    # property test)
    assert got == {(5, 5), (6, 5), (7, 5), (9, 9), (10, 10), (11, 10)}
