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

__all__ = ["salted_groupby_agg", "replicate_for_salted_join"]


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
