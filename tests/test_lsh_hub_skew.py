"""VERDICT r8 task #3 — induced-skew stress for the dedup band joins.

SCALE.md names the boilerplate hub (10^4+ copies of one template) as
the known quadratic risk for the LSH band self-join: every copy lands
in the SAME band bucket, and a bucket self-join owes ~n^2/2 candidate
pairs from a single join key — CPU-quadratic skew AQE cannot split
(it separates a partition's keys, never one key's matches). These
tests turn the prescribed mitigation (bucket-size pre-flight + hub
star collapse in ``minhash_lsh_duplicate_pairs_hub_capped``, and
``all_pairs_within_block`` for exact verification ops) from prose
into pinned properties:

- a 10^4-copy hub injected into the FULL sf0.1 corpus runs through
  the capped plan with LINEAR candidate volume (star edges), where
  the uncapped plan would owe ~5x10^7 pairs;
- on healthy data (driver sf) capped output == uncapped output
  EXACTLY — the cap never fires below its threshold;
- on a moderate hub where the uncapped clique is still feasible, the
  connected components (what dedup consumes) are IDENTICAL between
  star and clique representations;
- ``all_pairs_within_block`` fans a hub block's quadratic work across
  bucket tasks with no pair lost or duplicated.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.operators.cache import (
    release_tracked)
from us_flight_delay_data_pipeline_spark.operators.dedup import (
    minhash_lsh_duplicate_pairs, minhash_lsh_duplicate_pairs_hub_capped)
from us_flight_delay_data_pipeline_spark.operators.skew import (
    all_pairs_within_block)
from us_flight_delay_data_pipeline_spark.queries.llm_ext import (
    _HUB_CAP, MINHASH_COEFFS)
from us_flight_delay_data_pipeline_spark.sources.registry import load_table

# >= 3 tokens so the shingle filter keeps it; realistic boilerplate
_TEMPLATE = ("free shipping on all orders click here to unsubscribe "
             "from this newsletter and manage your email preferences")
_HUB_BASE = 10_000_000  # id range disjoint from any testdata doc_id


def _with_hub(spark, sf_dir, n_copies):
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text")
    hub = spark.range(n_copies).select(
        (F.col("id") + _HUB_BASE).alias("doc_id"),
        F.lit(_TEMPLATE).alias("text"))
    return docs.unionAll(hub)


def _components(pairs):
    """Plain-Python union-find over collected (doc_a, doc_b) pairs —
    the partition of doc ids that dedup actually consumes."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for x in parent:
        groups.setdefault(find(x), set()).add(x)
    return {frozenset(g) for g in groups.values()}


def test_hub_cap_never_fires_on_healthy_data(spark, sf_dir):
    """Driver testdata has no over-cap band bucket, so the capped
    variant must be EXACTLY the uncapped pair set (the 'unchanged
    oracle results' half of the VERDICT task)."""
    docs = load_table(spark, sf_dir, "documents")
    plain = {(r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
             for r in minhash_lsh_duplicate_pairs(
                 docs, MINHASH_COEFFS, threshold=0.3).collect()}
    capped = {(r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
              for r in minhash_lsh_duplicate_pairs_hub_capped(
                  docs, MINHASH_COEFFS, threshold=0.3,
                  hub_cap=_HUB_CAP).collect()}
    release_tracked()
    spark.catalog.clearCache()
    assert plain == capped and len(plain) > 0


def test_star_components_equal_clique_components_on_moderate_hub(
        spark, sf_dir):
    """300-copy hub: small enough that the uncapped clique (~45k
    pairs) is feasible, large enough to trip a 64-cap. Dedup consumes
    CONNECTED COMPONENTS, and star == clique at that level."""
    d = _with_hub(spark, sf_dir, 300)
    plain = [(r["doc_a"], r["doc_b"]) for r in
             minhash_lsh_duplicate_pairs(
                 d, MINHASH_COEFFS, threshold=0.3).collect()]
    capped = [(r["doc_a"], r["doc_b"]) for r in
              minhash_lsh_duplicate_pairs_hub_capped(
                  d, MINHASH_COEFFS, threshold=0.3,
                  hub_cap=_HUB_CAP).collect()]
    release_tracked()
    spark.catalog.clearCache()
    assert len(capped) < len(plain)  # star strictly cheaper
    assert _components(plain) == _components(capped)


def test_ten_k_hub_stays_linear_at_sf01(spark):
    """THE stress case: 10^4 template copies injected into the full
    sf0.1 corpus (~50k docs). Uncapped, the hub bucket alone owes
    C(10^4, 2) ~ 5x10^7 candidate pairs from one join key; capped, the
    hub contributes exactly n-1 star edges and every emitted hub pair
    verifies at Jaccard 1.0 against the representative. The candidate
    bound pins per-task work: no band bucket ever enters the pair
    join with more than hub_cap members, so per-bucket fan-out is
    <= C(64, 2) by construction — bounded task time at any hub size."""
    n_hub = 10_000
    d = _with_hub(spark, "/root/testdata/sf0.1", n_hub)
    out = minhash_lsh_duplicate_pairs_hub_capped(
        d, MINHASH_COEFFS, threshold=0.3, hub_cap=_HUB_CAP)
    hub_pairs = out.filter(F.col("doc_b") >= _HUB_BASE)
    agg = hub_pairs.agg(
        F.count("*").alias("n"),
        F.min("doc_a").alias("min_a"), F.max("doc_a").alias("max_a"),
        F.min("jaccard").alias("min_j"),
        F.countDistinct("doc_b").alias("n_members")).collect()[0]
    release_tracked()
    spark.catalog.clearCache()
    # the hub collapsed to a star: one representative, n-1 edges,
    # all exact duplicates of the template
    assert agg["n"] == n_hub - 1
    assert agg["min_a"] == agg["max_a"] == _HUB_BASE
    assert agg["n_members"] == n_hub - 1
    assert agg["min_j"] == 1.0


def test_all_pairs_within_block_fans_out_hub_block(spark):
    """The exact-verification mitigation: a 2000-row hub block joined
    through all_pairs_within_block must (a) produce exactly the
    C(2000,2) pairs of the plain quadratic join, each once, and (b)
    spread side B across all buckets so no task owns the block."""
    n, n_buckets = 2000, 32
    df = spark.range(n).select(
        F.lit("hub").alias("blk"), F.col("id").alias("rid"))
    joined = all_pairs_within_block(df, "blk", "rid",
                                    n_buckets=n_buckets)
    stats = joined.agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("b._bkt").alias("n_bkts"),
        F.max(F.col("b._bkt")).alias("max_bkt")).collect()[0]
    assert stats["n_pairs"] == n * (n - 1) // 2
    assert stats["n_bkts"] == n_buckets
    # per-bucket share of side B is ~n/n_buckets: the largest bucket
    # must hold well under the whole block (xxhash64 spread)
    per_bkt = (joined.groupBy("b._bkt").agg(
        F.countDistinct("b.rid").alias("nb")).collect())
    assert max(r["nb"] for r in per_bkt) < 2 * n / n_buckets
