"""Interval overlap join [EXT]: find pairs of rows whose time
intervals overlap, within an entity key — the range-join sibling of
the as-of join (``operators/asof.py``).

A naive formulation is an equi-join on the key with BOTH overlap
inequalities as post-join filters: per key the intermediate blows up
as |rows_per_key|^2, exactly the fan-out the as-of verdict flagged.
The scale path here is the standard banded range join: with a hard
upper bound L on interval length, pick bucket width W >= L and key
every interval by floor(start / W). Two overlapping intervals then
start within W of each other, so the probing side explodes to 3
bucket keys (its own ± 1) while the build side keeps just its home
bucket, and the join is pure equi on (key, bucket) — per-task fan-out
bounded by rows-per-(key, bucket), never the key's whole history.
Each qualifying pair meets in EXACTLY one bucket (the build row's
home bucket), so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_overlap_pairs"]


def interval_overlap_pairs(df: DataFrame, on: str, start: str, end: str,
                           id_col: str, max_len_sec: int,
                           closed: bool = True) -> DataFrame:
    """Self-join: unordered pairs of same-key rows with overlapping
    [start, end] intervals (closed endpoints by default).

    Requires every interval's length <= ``max_len_sec`` (the band
    bound that makes the equi formulation exact); rows violating it
    are rejected up front rather than silently dropped from pairs.
    ``id_col`` must be unique per row — pairs are emitted once with
    ``a_<id> < b_<id>``.

    Returns one row per overlapping pair: the key, both ids, both
    start times, and ``overlap_sec`` (the overlap length in seconds;
    >= 0 for closed intervals that merely touch).
    """
    width = int(max_len_sec)
    s, e = F.col(start).cast("timestamp"), F.col(end).cast("timestamp")
    base = (df.select(F.col(on).alias("_k"),
                      F.col(id_col).alias("_id"),
                      F.unix_timestamp(s).alias("_s"),
                      F.unix_timestamp(e).alias("_e"))
              # assert the band bound instead of mis-joining: a too-
              # long interval could overlap a neighbor > 1 bucket away
              .withColumn("_e", F.when(F.col("_e") - F.col("_s") > width,
                                       F.raise_error(F.lit(
                                           "interval longer than "
                                           "max_len_sec")))
                                 .otherwise(F.col("_e")))
              .withColumn("_bkt", F.floor(F.col("_s") / width)))
    build = base.select(F.col("_k").alias("_bk"),
                        F.col("_id").alias("_bid"),
                        F.col("_s").alias("_bs"),
                        F.col("_e").alias("_be"),
                        F.col("_bkt").alias("_bbkt"))
    probe = base.withColumn(
        "_pbkt", F.explode(F.array(F.col("_bkt") - 1, F.col("_bkt"),
                                   F.col("_bkt") + 1)))
    touch = (F.col("_s") <= F.col("_be")) & (F.col("_bs") <= F.col("_e")) \
        if closed else \
        (F.col("_s") < F.col("_be")) & (F.col("_bs") < F.col("_e"))
    pairs = probe.join(
        build,
        (F.col("_k") == F.col("_bk")) & (F.col("_pbkt") == F.col("_bbkt"))
        & (F.col("_id") < F.col("_bid")) & touch)
    return pairs.select(
        F.col("_k").alias(on),
        F.col("_id").alias(f"a_{id_col}"),
        F.col("_bid").alias(f"b_{id_col}"),
        F.col("_s").alias("a_start_sec"),
        F.col("_bs").alias("b_start_sec"),
        (F.least("_e", "_be") - F.greatest("_s", "_bs"))
        .alias("overlap_sec"))
