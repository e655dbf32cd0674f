"""Iterative graph algorithms on DataFrames (beyond
``components.py``'s connected components): PageRank.

Spark-first shape: one hash-join + one aggregate per iteration (the
Pregel message round expressed relationally), with the out-degree
table computed once. No RDDs, no driver-side adjacency — at 100 TB
the edge list shuffles on dst once per iteration and the rank vector
stays co-partitioned with it.

Determinism contract (what makes results oracle-comparable): per-edge
contributions are DOUBLE divisions (exact given identical inputs),
but their SUM is order-dependent in float. So each contribution is
quantized to integer units of 1e-12 via ``floor(c * 1e12)`` — floor
on doubles is IEEE-exact in every engine, unlike double→decimal
rounding, which resolves representation-boundary ties differently
(see queries/__init__ numeric-parity policy) — summed exactly as
DECIMAL(38,0), and the damped update applied on the de-quantized
double. Any engine following the same recipe produces bit-identical
ranks after any number of iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "PR_QUANT"]

PR_QUANT = 1e12  # contribution quantum: floor(c * PR_QUANT) units


def pagerank(edges: DataFrame, iterations: int = 3,
             damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             distinct_edges: bool = True) -> DataFrame:
    """PageRank over a DIRECTED edge list (undirected graphs: pass
    both directions). Returns (node, rank) after ``iterations``
    synchronous updates from a uniform start.

    rank_0(v) = 1/N
    rank_{i+1}(v) = (1-d)/N + d * sum_{u->v} q(rank_i(u) / deg_out(u))

    with q the 1e-12 floor quantization (see module doc). Nodes with
    no in-edges keep the teleport term; dangling nodes (no out-edges)
    contribute nothing — their mass leaks, the simplest standard
    variant and the one an unrolled SQL oracle mirrors exactly.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if distinct_edges:  # pass False when the input is distinct by
        e = e.distinct()  # construction — saves a full edge shuffle
    e = e.persist()
    nodes = (e.select(F.col("src").alias("node"))
              .union(e.select(F.col("dst").alias("node")))
              .distinct().persist())
    n_total = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # (src, dst, deg) — reused every iteration; the degree table is
    # |nodes|-sized, so it broadcasts into the edge list map-side
    small = n_total <= 5_000_000
    adj = e.join(F.broadcast(deg) if small else deg, "src").persist()
    adj.count()

    teleport = (1.0 - damping) / n_total
    # the rank vector is |nodes|-sized — when it fits a broadcast,
    # joining it INTO the (much larger) edge list map-side removes
    # the per-iteration edge shuffle entirely; past that size the
    # join falls back to hash-partitioning both sides on src
    ranks = nodes.select("node", F.lit(1.0 / n_total).alias("rank"))
    for _ in range(iterations):
        units = F.floor((F.col("rank") / F.col("deg")) * F.lit(PR_QUANT)) \
                 .cast("decimal(38,0)")
        rside = F.broadcast(ranks) if small else ranks
        contrib = (adj.join(rside, adj.src == ranks.node)
                      .select(F.col("dst").alias("node"), units.alias("u")))
        summed = contrib.groupBy("node").agg(
            (F.lit(teleport)
             + F.lit(damping)
             * (F.sum("u").cast("double") / F.lit(PR_QUANT))).alias("rank"))
        # nodes with no in-edges fall back to the teleport term
        ranks = (nodes.join(summed, "node", "left")
                      .select("node",
                              F.coalesce("rank", F.lit(teleport))
                               .alias("rank")))
        ranks = ranks.localCheckpoint()  # truncate the per-iter lineage
    e.unpersist(); nodes.unpersist(); adj.unpersist()
    return ranks
