"""[EXT] Wave-9 graph-curation operators: synchronous label
propagation (community detection) and bounded k-core peel (graph
denoising), completing the graph battery next to PageRank, connected
components, and the triangle census (`operators/graph.py`).

No reference counterpart (SURVEY.md §2 — the reference is ingest glue
plus three fixed aggregates); these are the two standard graph passes
a curation platform runs over similarity/co-occurrence graphs:

- **Label propagation** (Raghavan et al. 2007) — near-linear
  community detection; on a dedup/co-purchase graph the communities
  are the product families / template clusters that stratified
  sampling and leakage-safe fold assignment consume. Asynchronous
  LPA is order-dependent and tie-random, so this is the SYNCHRONOUS
  schedule with smallest-label ties — a pure function of the graph
  that an unrolled-SQL oracle reproduces exactly (the same
  determinism-over-convention trade every operator here makes).
- **k-core peel** — iteratively drop nodes with degree < k; the
  survivors (at fixpoint) form the maximal subgraph with min degree
  >= k. The standard denoiser before community detection: tendrils
  and leaf chains vanish, well-embedded structure stays. Bounded
  round count keeps it deterministic AND oracle-expressible; the
  property test pins that the bound reaches fixpoint on this graph.

Both run on the part co-purchase graph (support >= 2), the same edge
set as `copurchase_triangles` / `copurchase_clustering_coeff`, so the
graph-family queries compose: peel -> communities -> per-community
clustering stats is the intended pipeline.

Every output column is int64 — no float anywhere; oracle integer
aggregates CAST AS BIGINT (tests/test_oracle_portability.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from . import register

# Shared oracle CTEs: the support>=2 part co-purchase graph, as both
# canonical edges and the bidirectional adjacency (matches
# operators/graph.py::_bidirectional over the same edge set).
_GRAPH_CTE = """
    inst AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    cop AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n
      FROM inst a JOIN inst b ON a.l_orderkey = b.l_orderkey
       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    edges AS (SELECT p1 AS a, p2 AS b FROM cop WHERE n >= 2),
    bi AS (
      SELECT a AS src, b AS dst FROM edges
      UNION ALL
      SELECT b, a FROM edges
    )"""

_LPA_ROUNDS = 3
_KCORE_K = 3
_KCORE_ROUNDS = 4


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    b = li.select(F.col("l_orderkey").alias("_ok"),
                  F.col("l_partkey").alias("p2"))
    cop = (li.join(b, (F.col("l_orderkey") == F.col("_ok"))
                   & (F.col("l_partkey") < F.col("p2")))
             .groupBy(F.col("l_partkey").alias("p1"), "p2")
             .agg(F.count("*").alias("n")))
    return cop.filter(F.col("n") >= 2).select("p1", "p2")


def _lpa_oracle() -> str:
    rounds = ["l0 AS (SELECT DISTINCT src AS node, src AS label FROM bi)"]
    for r in range(1, _LPA_ROUNDS + 1):
        rounds.append(f"""c{r} AS (
      SELECT bi.src, l.label, COUNT(*) AS c
      FROM bi JOIN l{r - 1} l ON bi.dst = l.node
      GROUP BY 1, 2
    ),
    l{r} AS (
      SELECT src AS node, label FROM (
        SELECT src, label,
               row_number() OVER (PARTITION BY src
                                  ORDER BY c DESC, label) AS rn
        FROM c{r}) WHERE rn = 1
    )""")
    last = f"l{_LPA_ROUNDS}"
    sep = ",\n    "
    return f"""
    WITH {_GRAPH_CTE},
    {sep.join(rounds)},
    cs AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members
      FROM {last} GROUP BY label
    )
    SELECT l.node, l.label AS community, cs.n_members
    FROM {last} l JOIN cs ON cs.label = l.label
    """


@register(
    "copurchase_lpa_communities",
    _lpa_oracle(),
    doc="Synchronous label propagation (Raghavan et al. 2007) over "
        f"the support>=2 part co-purchase graph, {_LPA_ROUNDS} rounds: "
        "every node starts as its own label; each round every node "
        "simultaneously adopts its neighbors' most frequent label, "
        "ties to the SMALLEST label (pure-neighbor variant, no "
        "self-vote). Returns (node, community, n_members). "
        "Deterministic by construction — sync schedule + min-label "
        "ties make the result a pure function of the graph, which is "
        "what lets an unrolled-SQL oracle pin it bit-for-bit (async "
        "LPA, the textbook default, is unverifiable). Scale shape: "
        "per round one adjacency-x-labels hash join plus TWO hash "
        "aggregates — the argmax is max(struct(count, -label)), a "
        "partial-aggregable agg, NOT a rank window, so no per-node "
        "sort and no group serialized onto one task. Communities over "
        "a dedup graph are the template clusters leakage-safe fold "
        "assignment consumes (cluster_aware_folds).",
)
def copurchase_lpa_communities(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation
    labels = label_propagation(_copurchase_edges(spark, sf_dir),
                               rounds=_LPA_ROUNDS, a="p1", b="p2")
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_members"))
    return (labels.join(sizes, "label")
                  .select("node", F.col("label").alias("community"),
                          "n_members"))


def _kcore_oracle() -> str:
    parts = ["d0 AS (SELECT src, COUNT(*) AS d FROM bi GROUP BY src)"]
    prev_bi, prev_d = "bi", "d0"
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(f"""k{r} AS (
      SELECT src FROM {prev_d} WHERE d >= {_KCORE_K}
    ),
    bi{r} AS (
      SELECT b.src, b.dst FROM {prev_bi} b
      JOIN k{r} ON b.src = k{r}.src
      JOIN k{r} kk ON b.dst = kk.src
    ),
    d{r} AS (SELECT src, COUNT(*) AS d FROM bi{r} GROUP BY src)""")
        prev_bi, prev_d = f"bi{r}", f"d{r}"
    sep = ",\n    "
    return f"""
    WITH {_GRAPH_CTE},
    {sep.join(parts)}
    SELECT src AS node, CAST(d AS BIGINT) AS d FROM {prev_d}
    """


@register(
    "copurchase_kcore",
    _kcore_oracle(),
    doc=f"Bounded k-core peel (k={_KCORE_K}, {_KCORE_ROUNDS} rounds) "
        "over the support>=2 part co-purchase graph: each round "
        "simultaneously drops every node whose current degree is "
        f"< {_KCORE_K} with its edges, then recomputes degrees; "
        "returns surviving (node, d). The peel reaches fixpoint "
        "within the bound on this graph (pinned by the wave-9 "
        "property test), so the survivors are the exact k-core — the "
        "maximal subgraph with min degree >= k, the standard "
        "denoising pass before community detection (tendrils and "
        "leaf chains vanish; well-embedded nodes stay). Fixed round "
        "count = deterministic pure function of the graph = "
        "unrolled-SQL-oracle-checkable. Scale shape per round: one "
        "degree hash-agg over the live edges + two semi-joins "
        "dropping edges that touch peeled nodes; the edge set only "
        "shrinks, and nothing shuffles more than 16 B/edge.",
)
def copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore_peel
    return kcore_peel(_copurchase_edges(spark, sf_dir),
                      k=_KCORE_K, rounds=_KCORE_ROUNDS, a="p1", b="p2")
