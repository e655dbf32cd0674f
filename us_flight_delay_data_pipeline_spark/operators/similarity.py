"""Similarity-search operators over embedding columns
(``array<float>``): exact brute-force top-k and LSH-bucketed ANN.

Per-pair work is a single JVM-side dot product — norms are hoisted to
per-row columns before the join (computing them inside the pair
expression re-evaluates two array aggregates per pair: measured ~3×
slower). At 100 TB the bucketed variant is the default: candidates
come from an equi-join on the hyperplane-sign bucket, so per-query
cost is corpus/2^n_planes, and AQE's skew handling splits hot buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import vec_dot, vec_norm

__all__ = [
    "hyperplane_bucket", "brute_force_topk", "lsh_bucketed_topk",
    "embedding_near_duplicates", "assign_ivf_cells", "build_ivf_index",
    "probe_ivf_index",
]


def hyperplane_bucket(vec: Column, hyperplanes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket: bit j = sign(vec · H_j)."""
    bucket = F.lit(0)
    for j, hp in enumerate(hyperplanes):
        lit = F.array(*[F.lit(v) for v in hp])
        dot = F.aggregate(
            F.zip_with(vec, lit, lambda x, h: x.cast("double") * h),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _with_norm(df: DataFrame, vec_col: str, extra: list[str]) -> DataFrame:
    return df.select(*extra, vec_col,
                     vec_norm(F.col(vec_col)).alias("_nrm"))


def _pair_cosine(qv: str, cv: str, qn: str, cn: str) -> Column:
    denom = F.col(cn) * F.col(qn)
    return F.when(denom == 0, F.lit(0.0)) \
            .otherwise(vec_dot(F.col(qv), F.col(cv)) / denom)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "q_id") -> DataFrame:
    """Exact cosine top-k: broadcast the query set, one corpus scan,
    per-query heap via window-rank (one shuffle on q_id)."""
    from pyspark.sql.window import Window
    c = _with_norm(corpus, vec_col, [id_col])
    q = _with_norm(queries, vec_col, [query_id_col]) \
        .withColumnsRenamed({vec_col: "_qv", "_nrm": "_qnrm"})
    sims = (c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col))
              .select(query_id_col, F.col(id_col).alias("neighbor_id"),
                      _pair_cosine("_qv", vec_col, "_qnrm", "_nrm")
                      .alias("cosine")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select(query_id_col, "neighbor_id", "rank",
                        F.round("cosine", 6).alias("cosine")))


def lsh_bucketed_topk(corpus: DataFrame, hyperplanes: list[list[float]],
                      k: int = 3, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      query_filter: Column | None = None) -> DataFrame:
    """ANN: hyperplane-sign bucketing, candidates only from the
    query's bucket. Recall < 1 by construction; n_planes trades
    recall against per-query cost (corpus / 2^n_planes)."""
    from pyspark.sql.window import Window
    e = corpus.select(id_col, vec_col,
                      hyperplane_bucket(F.col(vec_col), hyperplanes)
                      .alias("bucket"),
                      vec_norm(F.col(vec_col)).alias("_nrm"))
    qf = query_filter if query_filter is not None else F.lit(True)
    q = (e.filter(qf)
          .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("_qv"),
                  F.col("bucket").alias("q_bucket"),
                  F.col("_nrm").alias("_qnrm")))
    sims = (e.join(F.broadcast(q), (F.col("bucket") == F.col("q_bucket"))
                   & (F.col(id_col) != F.col("q_id")))
              .select("q_id", F.col(id_col).alias("neighbor_id"),
                      _pair_cosine("_qv", vec_col, "_qnrm", "_nrm")
                      .alias("cosine")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("q_id", "neighbor_id", "rank",
                        F.round("cosine", 6).alias("cosine")))


def embedding_near_duplicates(corpus: DataFrame, block_col: str,
                              threshold: float = 0.45,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key (label,
    LSH bucket, ...). The embedding variant of fuzzy dedup. The
    quadratic dot-product work is bucket-parallelized — see
    :func:`..operators.skew.all_pairs_within_block`."""
    from .skew import all_pairs_within_block
    e = corpus.select(id_col, block_col, vec_col,
                      vec_norm(F.col(vec_col)).alias("_nrm"))
    j = all_pairs_within_block(e, block_col, id_col)
    denom = F.col("a._nrm") * F.col("b._nrm")
    cos = F.when(denom == 0, F.lit(0.0)).otherwise(
        vec_dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / denom)
    return (j.select(F.col(f"a.{id_col}").alias("vec_a"),
                     F.col(f"b.{id_col}").alias("vec_b"), cos.alias("cosine"))
             .filter(F.col("cosine") >= threshold)
             .withColumn("cosine", F.round("cosine", 6)))


def assign_ivf_cells(corpus: DataFrame, centroids: DataFrame,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its max-cosine centroid (IVF coarse
    quantization). ``centroids`` is a small (c_id, cv) DataFrame —
    always broadcast. Ties break to the lowest c_id so the layout is
    deterministic. Output: corpus columns + ``cell``."""
    from pyspark.sql.window import Window
    cent = F.broadcast(centroids.select(
        F.col("c_id"), F.col("cv"), vec_norm(F.col("cv")).alias("_cnrm")))
    scored = (corpus.withColumn("_nrm", vec_norm(F.col(vec_col)))
                    .crossJoin(cent)
                    .withColumn("_sim", _pair_cosine("cv", vec_col,
                                                     "_cnrm", "_nrm")))
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("c_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1)
                  .select(*corpus.columns, F.col("c_id").alias("cell")))


def build_ivf_index(corpus: DataFrame, centroids: DataFrame, path: str,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Materialize the IVF layout: parquet partitioned by ``cell``, so
    a probe with nprobe cells reads exactly nprobe partitions (static
    pruning for literal cells, dynamic partition pruning for a joined
    query table). This is THE scale move for ANN at 100 TB — the scan
    cost per query drops from the full corpus to corpus/nlist."""
    assign_ivf_cells(corpus, centroids, id_col, vec_col) \
        .write.mode("overwrite").partitionBy("cell").parquet(path)


def probe_ivf_index(spark, path: str, queries: DataFrame, k: int = 3,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "q_id") -> DataFrame:
    """Top-k within each query's cell (nprobe=1) against a
    :func:`build_ivf_index` layout. ``queries`` must carry a ``cell``
    column (from :func:`assign_ivf_cells` against the same centroids).
    The equi-join on the partition column + broadcast query side lets
    Spark plan dynamic partition pruning: only probed cells are read."""
    from pyspark.sql.window import Window
    c = spark.read.parquet(path).withColumn(
        "_nrm", vec_norm(F.col(vec_col)))
    q = (queries.withColumn("_qnrm", vec_norm(F.col(vec_col)))
                .select(query_id_col, F.col(vec_col).alias("_qv"),
                        "_qnrm", F.col("cell").alias("_qcell")))
    sims = (c.join(F.broadcast(q),
                   (F.col("cell") == F.col("_qcell"))
                   & (F.col(id_col) != F.col(query_id_col)))
              .select(query_id_col, F.col(id_col).alias("neighbor_id"),
                      _pair_cosine("_qv", vec_col, "_qnrm", "_nrm")
                      .alias("cosine")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select(query_id_col, "neighbor_id", "rank",
                        F.round("cosine", 6).alias("cosine")))
