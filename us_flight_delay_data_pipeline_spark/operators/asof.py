"""As-of join [EXT] (SURVEY.md §2.3): match each left row to the
latest right row at-or-before its timestamp (direction='backward') or
earliest at-or-after (direction='forward'), within an entity key.

Implementation: equi-join on the entity key with the time bound as a
post-join filter, then ``max_by``/``min_by`` per left row — the join
stays a hash join (never nested-loop), and ties break deterministically
on the full (time, tiebreak) struct. For very wide time ranges at
100 TB, pre-bucket both sides by coarse time (e.g. day) and join on
(key, bucket) ± 1 to bound the fan-out before the argmax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_bucketed", "asof_join_sorted"]


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_time: str, right_time: str,
              value_cols: list[str], direction: str = "backward",
              tolerance: str | None = None,
              tiebreak: str | None = None) -> DataFrame:
    """Returns left's columns + the as-of matched ``value_cols``.

    ``tolerance``: optional SQL interval literal (e.g. "INTERVAL 7
    DAYS") bounding how far back/forward a match may be — also the
    scale lever, since it lets Catalyst drop unmatchable rows early.
    ``tiebreak``: right column for deterministic ordering among equal
    timestamps (defaults to the first value col).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    tb = tiebreak or value_cols[0]

    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = (F.col(f"l.{on}") == F.col(f"r.{on}"))
    if direction == "backward":
        cond = cond & (rt <= lt)
        if tolerance:
            cond = cond & (rt >= lt - F.expr(tolerance))
        pick = F.max_by(
            F.struct(*[F.col(f"r.{c}") for c in value_cols]),
            F.struct(rt, F.col(f"r.{tb}")))
    else:
        cond = cond & (rt >= lt)
        if tolerance:
            cond = cond & (rt <= lt + F.expr(tolerance))
        pick = F.min_by(
            F.struct(*[F.col(f"r.{c}") for c in value_cols]),
            F.struct(rt, F.col(f"r.{tb}")))

    l, r = left.alias("l"), right.alias("r")
    joined = l.join(r, cond)
    grouped = (joined.groupBy(*[F.col(f"l.{c}") for c in left.columns])
                     .agg(pick.alias("_asof")))
    return grouped.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in value_cols])


def asof_join_bucketed(left: DataFrame, right: DataFrame, on: str,
                       left_time: str, right_time: str,
                       value_cols: list[str], tolerance_sec: int,
                       tiebreak: str | None = None,
                       strict: bool = False) -> DataFrame:
    """Backward as-of join with a hard tolerance, joined on coarse
    TIME BUCKETS — the 100 TB formulation promised above.

    Bucket width = tolerance: a right row at-or-before the left time
    and within tolerance lies in the left row's bucket or the one
    before, so the left side explodes to exactly 2 bucket keys and the
    join becomes pure equi on (entity, bucket). Per-task fan-out is
    bounded by rows-per-(entity, bucket) instead of the entity's whole
    history — the difference between a bounded merge and an unbounded
    one when an entity has years of events. Each matching pair appears
    in exactly one bucket (the right row's own), so no dedup is
    needed before the argmax."""
    tb = tiebreak or value_cols[0]
    width = int(tolerance_sec)
    # The right side is RENAMED (not just aliased): with self-as-of
    # the two sides share lineage, and string alias resolution
    # ("l.x" / "r.x") can silently bind to the wrong side after
    # Spark's join dedup — renaming makes every reference unambiguous
    # by construction.
    r2 = right.select(*[F.col(c).alias(f"_r_{c}") for c in right.columns])
    lt = F.col(left_time).cast("timestamp")
    rt = F.col(f"_r_{right_time}").cast("timestamp")
    lbucket = F.floor(F.unix_timestamp(lt) / width)
    rbucket = F.floor(F.unix_timestamp(rt) / width)
    l2 = left.withColumn("_bkt", F.explode(F.array(lbucket, lbucket - 1)))
    r2 = r2.withColumn("_r_bkt", rbucket)
    # strict=True: "latest BEFORE", excluding simultaneous rows —
    # what self-as-of (previous row of the same entity) needs
    cond = ((F.col(on) == F.col(f"_r_{on}"))
            & (F.col("_bkt") == F.col("_r_bkt"))
            & ((rt < lt) if strict else (rt <= lt))
            & (rt >= lt - F.expr(f"INTERVAL {width} SECONDS")))
    pick = F.max_by(F.struct(*[F.col(f"_r_{c}").alias(c)
                               for c in value_cols]),
                    F.struct(rt, F.col(f"_r_{tb}")))
    grouped = (l2.join(r2, cond)
                 .groupBy(*left.columns)
                 .agg(pick.alias("_asof")))
    return grouped.select(
        *left.columns,
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in value_cols])


def asof_join_sorted(left: DataFrame, right: DataFrame, on: str,
                     left_time: str, right_time: str,
                     value_cols: list[str],
                     tiebreak: str | None = None) -> DataFrame:
    """Backward as-of join via union + sort + last-observation-carried-
    forward — the scale path when NO tolerance bound exists (so
    bucketing can't help and the equi-join + filter formulation's
    per-key intermediate is |left_per_key| x |right_per_key|).

    Both sides union on (key, time); one shuffle partitions by key; a
    partitioned window sorted by (time, side, tiebreak) carries the
    latest right row forward onto each left row. Per-key cost is
    O((l+r) log(l+r)) — linear in each side's history instead of their
    product — which is how kdb/QuestDB-style as-of merges scale. Right
    rows at exactly the left timestamp match (<=): they sort before
    the left row (side 0 < 1). Ties among right rows at one timestamp
    resolve to the max tiebreak (sort asc + carry LAST). Left rows
    with no preceding right row are dropped (inner semantics, same as
    :func:`asof_join`).
    """
    from pyspark.sql.window import Window
    tb = tiebreak or value_cols[0]
    payload = F.struct(*[F.col(c) for c in value_cols])
    r_side = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tb).alias("_tb"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns])
    l_side = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tb].dataType).alias("_tb"),
        F.lit(None).cast(r_side.schema["_payload"].dataType)
         .alias("_payload"),
        *left.columns)
    u = r_side.unionByName(l_side)
    w = (Window.partitionBy("_k")
               .orderBy("_t", "_side", "_tb")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.withColumn("_asof",
                           F.last("_payload", ignorenulls=True).over(w))
    return (carried.filter((F.col("_side") == 1)
                           & F.col("_asof").isNotNull())
                   .select(*left.columns,
                           *[F.col(f"_asof.{c}").alias(f"asof_{c}")
                             for c in value_cols]))
