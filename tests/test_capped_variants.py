"""Cross-variant invariants the per-query DuckDB oracles cannot see:
each capped operator's relationship to its flat (exact-recall)
reference.

semantic_dedup_capped dominance: a vector dropped under the cap has a
lower-id LEAF-mate with cosine >= T; that pair shares the level-1
cell, so the flat query drops it too — the capped drop set is a
SUBSET of the flat drop set, hence per-cell n_dropped(capped) <=
n_dropped(flat) and survivors never shrink. A violation means the
leaf assignment leaked a vector out of its level-1 cell (or the two
queries' thresholds diverged).

knn_graph_mutual_capped is NOT a subset (restricting candidates can
promote a different pool member into the top-k), so the pinned
invariants are structural: per-source at most K edges, every capped
edge's dst must be a pool member, and the recall vs flat is reported
by the knn_cap_recall_audit query rather than asserted here.
"""

from __future__ import annotations

from us_flight_delay_data_pipeline_spark.queries import load_registry

REGISTRY = load_registry()


def test_semdedup_capped_drops_are_dominated_by_flat(spark, sf_dir):
    flat = {r["cell"]: r for r in
            REGISTRY["semantic_dedup"].fn(spark, sf_dir).collect()}
    capped = {r["cell"]: r for r in
              REGISTRY["semantic_dedup_capped"].fn(spark, sf_dir)
              .collect()}
    assert flat.keys() == capped.keys()
    for cell in flat:
        f, c = flat[cell], capped[cell]
        assert f["n_vectors"] == c["n_vectors"]
        assert c["n_dropped"] <= f["n_dropped"], (
            f"cell {cell}: capped dropped {c['n_dropped']} > flat "
            f"{f['n_dropped']} — a leaf crossed its level-1 cell")
        assert c["n_survivors"] >= f["n_survivors"]
        assert c["max_leaf_size"] <= c["n_vectors"]


def test_knn_capped_edges_are_structurally_valid(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from us_flight_delay_data_pipeline_spark.operators.hashing import h32
    from us_flight_delay_data_pipeline_spark.operators.similarity import \
        hyperplane_bucket
    from us_flight_delay_data_pipeline_spark.queries.curation_extra import \
        _KNN_K, _KNN_POOL_CAP
    from us_flight_delay_data_pipeline_spark.queries.llm_ext import \
        HYPERPLANES
    from us_flight_delay_data_pipeline_spark.sources.registry import \
        load_table

    edges = REGISTRY["knn_graph_mutual_capped"].fn(spark, sf_dir)
    # an empty edge set would make every downstream assert vacuous
    # (and max('count') NULL) — fail it explicitly instead
    assert edges.limit(1).count() == 1, (
        "knn_graph_mutual_capped returned no edges at this SF — the "
        "structural invariants below would pass vacuously")
    per_src = edges.groupBy("vec_a").count().agg(
        F.max("count").alias("mx")).collect()[0]["mx"]
    assert per_src <= _KNN_K
    # every capped edge's dst must be a hash-ring pool member —
    # recompute the pool independently (same recipe: per bucket, the
    # _KNN_POOL_CAP lowest h32('knnpool|'||vec_id) ids)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        hyperplane_bucket(F.col("embedding"), HYPERPLANES).alias("bucket"))
    wpool = Window.partitionBy("bucket").orderBy(
        h32(F.concat(F.lit("knnpool|"), F.col("vec_id").cast("string"))),
        "vec_id")
    pool = (e.withColumn("pr", F.row_number().over(wpool))
             .filter(F.col("pr") <= _KNN_POOL_CAP)
             .select(F.col("vec_id").alias("pool_id")))
    stray = edges.join(pool, edges.vec_b == pool.pool_id, "left_anti")
    assert stray.count() == 0, (
        "capped kNN emitted an edge whose dst is outside the "
        "per-bucket candidate pool")
    # mutual implies the reverse edge exists in the SAME result
    e2 = edges.select("vec_a", "vec_b", "mutual")
    rev = e2.select(F.col("vec_a").alias("rb"), F.col("vec_b").alias("ra"))
    missing = (e2.filter("mutual")
                 .join(rev, (e2.vec_a == F.col("ra"))
                       & (e2.vec_b == F.col("rb")), "left_anti"))
    assert missing.count() == 0
