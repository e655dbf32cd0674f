"""Skew mitigation (SURVEY.md §7 step 8): salted aggregation and
salted broadcast-side replication for hot keys.

AQE's skew-join splitting handles most cases at runtime; explicit
salting is for the cases AQE can't see — a groupBy where one key holds
30% of rows (the reference's carrier distribution: WN/AA/DL dominate),
or a join against a dimension where stats are missing. Salting is a
two-shuffle trade: shuffle 1 distributes (key, salt) evenly, shuffle 2
merges the per-salt partials — worth it only when the hot key would
otherwise serialize one reducer.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_groupby_agg", "replicate_for_salted_join",
           "all_pairs_within_block"]


def all_pairs_within_block(df: DataFrame, block_col: str, id_col: str,
                           n_buckets: int = 32) -> DataFrame:
    """Bucket-parallelized all-pairs self-join within a blocking key,
    for quadratic verification operators (exact Jaccard, cosine
    near-dup).

    A plain self-join on a low-cardinality block (language, label)
    serializes each block's O(n²) work into one task, and AQE cannot
    split it: the skew is CPU-quadratic, not shuffle-bytes. Side B
    keys on ``pmod(xxhash64(id), n_buckets)``; side A is replicated
    across all buckets; the join key becomes (block, bucket). Every
    unordered pair still meets exactly once (A meets B only in B's
    bucket, and ``a.id < b.id`` orders the pair), but the quadratic
    work fans out over block×bucket tasks. Replication multiplies A's
    shuffle volume by n_buckets — linear in corpus size, the standard
    all-pairs trade. Both sides are explicitly repartitioned on the
    join keys: user repartitions are exempt from AQE's byte-based
    coalescing and co-partition the join (no extra shuffle).

    Returns the joined DataFrame with sides aliased ``a`` and ``b``;
    callers add their own projections / extra predicates.
    """
    n_part = max(n_buckets,
                 df.sparkSession.sparkContext.defaultParallelism)
    a = (df.withColumn(
             "_bkt", F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))))
           .repartition(n_part, block_col, "_bkt").alias("a"))
    b = (df.withColumn(
             "_bkt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
                      .cast("int"))
           .repartition(n_part, block_col, "_bkt").alias("b"))
    return a.join(b, (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
                  & (F.col("a._bkt") == F.col("b._bkt"))
                  & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))


def salted_groupby_agg(df: DataFrame, keys: list[str],
                       aggs: dict[str, Column],
                       mergers: dict[str, Callable[[str], Column]],
                       n_salts: int = 16) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: name → aggregate expression for phase 1 (per key+salt).
    ``mergers``: name → function(column_name) → merge aggregate for
    phase 2 (sums re-sum, counts re-sum, maxes re-max...). Only
    algebraic aggregates decompose this way — avg must be expressed as
    sum+count by the caller.

    Example::

        salted_groupby_agg(
            li, ["l_returnflag"],
            aggs={"sum_qty": F.sum("l_quantity"), "n": F.count("*")},
            mergers={"sum_qty": F.sum, "n": F.sum})
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    phase1 = (df.withColumn("_salt", salt)
                .groupBy(*keys, "_salt")
                .agg(*[expr.alias(name) for name, expr in aggs.items()]))
    return phase1.groupBy(*keys).agg(
        *[mergers[name](name).alias(name) for name in aggs])


def replicate_for_salted_join(dim: DataFrame, n_salts: int = 16,
                              salt_col: str = "_salt") -> DataFrame:
    """Explode the (small) dimension side n_salts× so a skewed fact
    side salted with ``(rand()*n) % n`` can equi-join on
    (key, salt) — every replica handles 1/n of the hot key's rows."""
    return dim.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
