"""Bucketed-table layout for co-located (shuffle-free) joins.

The brief's third join strategy next to broadcast and salted shuffle:
pre-hash both fact tables into the same number of buckets on the join
key at WRITE time, and every subsequent equi-join on that key needs no
exchange at all — SortMergeJoin reads bucket i of A against bucket i
of B. At 100 TB this converts the recurring orders⋈lineitem shuffle
(the single largest network cost in the star schema) into a local
merge; the price is one up-front bucketed write and that both sides
must agree on (key, n_buckets).

Bucketed tables require the session catalog (``saveAsTable`` — plain
``parquet(path)`` files cannot carry bucket metadata), which is why
this lives behind functions instead of the path-based registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_ready"]


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 16) -> None:
    """Persist ``df`` as a catalog table bucketed (and sorted) by
    ``key``. Sorting within buckets lets SortMergeJoin skip its sort
    step too — the join degenerates to a streamed merge."""
    (df.write.mode("overwrite")
       .bucketBy(n_buckets, key)
       .sortBy(key)
       .format("parquet")
       .saveAsTable(table))


def bucketed_join_ready(spark: SparkSession, left: str, right: str,
                        key_left: str, key_right: str,
                        merge: bool = False) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys.
    With matching bucket specs the physical plan contains no Exchange
    on either side (verify with ``.explain``/the plan-audit test).

    ``merge=True`` hints SortMergeJoin — at small SF the planner
    prefers broadcast (which bypasses bucketed reads entirely); the
    hint shows the plan the same tables produce once both sides are
    too big to broadcast, which is the regime bucketing exists for."""
    lt = spark.table(left)
    if merge:
        lt = lt.hint("merge")
    rt = spark.table(right)
    return lt.join(rt, lt[key_left] == rt[key_right])
