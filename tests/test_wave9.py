"""Wave-9 graph-operator properties beyond the oracle differential:
brute-force Python models (formulated differently from both the Spark
plan and its unrolled-SQL oracle) plus hand-built unit pins."""

from __future__ import annotations

from collections import Counter, defaultdict

from us_flight_delay_data_pipeline_spark.operators.graph import (
    kcore_peel, label_propagation)
from us_flight_delay_data_pipeline_spark.queries import load_registry
from us_flight_delay_data_pipeline_spark.queries.curation_wave9 import (
    _KCORE_K, _KCORE_ROUNDS, _LPA_ROUNDS)
from us_flight_delay_data_pipeline_spark.sources.registry import load_table

REGISTRY = load_registry()


def _copurchase_adj(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_partkey").distinct().collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    pair = Counter()
    for items in baskets.values():
        s = sorted(items)
        for i, a in enumerate(s):
            for b in s[i + 1:]:
                pair[(a, b)] += 1
    adj = defaultdict(set)
    for (a, b), n in pair.items():
        if n >= 2:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _lpa_model(adj, rounds):
    labels = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v, nbrs in adj.items():
            cnt = Counter(labels[u] for u in nbrs)
            best = max(cnt.values())
            nxt[v] = min(l for l, c in cnt.items() if c == best)
        labels = nxt
    return labels


def _kcore_model(adj, k):
    """Peel to FIXPOINT (not round-bounded) — returns (survivors'
    degree map, number of rounds the peel needed)."""
    live = {v: set(n) for v, n in adj.items()}
    rounds = 0
    while True:
        drop = {v for v, n in live.items() if len(n) < k}
        if not drop:
            return {v: len(n) for v, n in live.items()}, rounds
        rounds += 1
        live = {v: n - drop for v, n in live.items() if v not in drop}


def test_lpa_matches_sync_bruteforce(spark, sf_dir):
    adj = _copurchase_adj(spark, sf_dir)
    expect = _lpa_model(adj, _LPA_ROUNDS)
    sizes = Counter(expect.values())
    out = REGISTRY["copurchase_lpa_communities"].fn(spark, sf_dir) \
        .collect()
    assert len(out) == len(adj)
    for r in out:
        assert expect[r["node"]] == r["community"]
        assert sizes[r["community"]] == r["n_members"]


def test_kcore_bound_reaches_fixpoint_and_matches(spark, sf_dir):
    """The operator contract: the FIXED round bound must cover the
    fixpoint on this graph, making the bounded peel the exact k-core
    (every survivor has degree >= k in the surviving subgraph)."""
    adj = _copurchase_adj(spark, sf_dir)
    expect, rounds_needed = _kcore_model(adj, _KCORE_K)
    assert rounds_needed <= _KCORE_ROUNDS, (
        f"peel needs {rounds_needed} rounds; raise _KCORE_ROUNDS")
    out = {r["node"]: r["d"] for r in
           REGISTRY["copurchase_kcore"].fn(spark, sf_dir).collect()}
    assert out == expect
    assert all(d >= _KCORE_K for d in out.values())


def test_kcore_unit_pin_k4_with_tendril(spark):
    """K4 plus a pendant chain 4-5-6: the chain peels away over two
    rounds (6 first, then 5, then 4 keeps degree 3 from the K4...
    actually node 4 is IN the K4; the chain hangs off it), leaving
    exactly the K4 at degree 3."""
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    out = {r["node"]: r["d"]
           for r in kcore_peel(df, k=3, rounds=4).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_lpa_unit_pin_two_triangles_bridge(spark):
    """Two triangles {1,2,3} and {7,8,9} joined by bridge 3-7. Sync
    LPA with min-label ties: round 1 gives every node its
    neighborhood minimum; the model below IS the spec — pin the
    operator to it on a graph small enough to verify by hand."""
    edges = [(1, 2), (1, 3), (2, 3), (7, 8), (7, 9), (8, 9), (3, 7)]
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expect = _lpa_model(adj, 3)
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    out = {r["node"]: r["label"]
           for r in label_propagation(df, rounds=3).collect()}
    assert out == expect
    # the two triangle cores must end in distinct communities
    assert out[1] != out[9]
