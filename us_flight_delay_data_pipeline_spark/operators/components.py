"""Connected components over a pair/edge DataFrame — the clustering
step of fuzzy deduplication ([EXT], SURVEY.md §7 step 7): near-dup
PAIRS (MinHash/SimHash/Jaccard output) must be grouped into CLUSTERS
so one canonical document per cluster survives. Pair emission alone
under-deletes: A~B and B~C puts A,C in the same cluster only through
transitive closure.

Algorithm: iterative min-label propagation. Each round every node
adopts the minimum component label among itself and its neighbors;
convergence in O(graph diameter) rounds. Near-dup graphs are unions
of small dense clusters (diameter 2-3 in practice), so 3-5 rounds
settle real corpora. Per round: one shuffle join (edges × labels) and
one min-aggregate — both on 16-byte (node, label) pairs, never text.

100 TB posture:
- the edge list is symmetrized once and cached; per-round state is
  two longs per node;
- ``localCheckpoint`` after every round truncates the lineage so the
  plan does not grow linearly with iterations (classic iterative-
  algorithm failure mode on Spark);
- convergence is detected with an aggregate (count of changed
  labels), not a collect;
- for adversarial high-diameter graphs switch to the large-star /
  small-star formulation (Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14) which converges in O(log² n) —
  same join/agg primitives, more rounds of them; dedup graphs do not
  need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 25) -> DataFrame:
    """Return ``(node, component)`` for every node in ``edges``, where
    ``component`` is the minimum node id in the node's connected
    component. Undirected: each input pair connects both endpoints.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .distinct()
            .persist())
    # Round 1 needs no join: every node's first label is
    # min(self, neighbors), computable straight off the edge list.
    labels = (sym.groupBy(F.col("a").alias("node"))
                 .agg(F.min("b").alias("nmin"))
                 .select("node", F.least("node", "nmin").alias("component"))
                 .localCheckpoint(eager=True))
    for _ in range(max_iter):
        neighbor_min = (sym.join(labels, sym["b"] == labels["node"])
                           .groupBy(F.col("a").alias("node"))
                           .agg(F.min("component").alias("neighbor_min")))
        # Fold the neighbor minimum in with a left join and carry a
        # per-node `changed` flag, so convergence detection is a
        # cheap count over the already-checkpointed round output
        # instead of an extra shuffle join against the old labels.
        new_state = (labels.join(neighbor_min, "node", "left")
                           .select("node",
                                   F.least("component",
                                           F.coalesce("neighbor_min",
                                                      "component"))
                                    .alias("component"),
                                   (F.col("neighbor_min")
                                    < F.col("component")).alias("changed"))
                           .localCheckpoint(eager=True))
        labels = new_state.select("node", "component")
        if new_state.filter("changed").count() == 0:
            break
    sym.unpersist()
    return labels
