"""Stream-stream joins — the watermarked event-time join the
reference's "real-time" framing implies but never ships (SURVEY.md
§2.10 lists stream-stream joins under "notably absent").

Semantics that make this work at scale (and that the test pins):
- BOTH sides carry a watermark, and the join condition includes an
  event-time RANGE bound. Together they let Spark expire join state:
  a left row can be dropped once the right watermark passes
  left_ts + max_span. Without the range bound, state grows without
  bound and a 100 TB/day stream OOMs its state store.
- The join key condition is a plain equi-join, so each micro-batch
  plans a streaming symmetric hash join partitioned by key — state
  is sharded across executors exactly like a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_stream_attribution_join", "attribution_join_batch"]


def _attribution_cond(left: DataFrame, right: DataFrame, on: str,
                      left_ts: str, right_ts: str,
                      max_span: str) -> Column:
    return ((left[on] == right[on])
            & (right[right_ts] >= left[left_ts])
            & (right[right_ts] <= left[left_ts]
               + F.expr(f"INTERVAL {max_span}")))


def stream_stream_attribution_join(
        left: DataFrame, right: DataFrame, on: str,
        left_ts: str, right_ts: str,
        watermark: str = "10 minutes",
        max_span: str = "30 minutes") -> DataFrame:
    """Join two event streams on ``on`` where the right event lands
    within ``[left_ts, left_ts + max_span]`` — e.g. purchases
    attributed to the views that preceded them. Inner join; both
    watermarks + the range bound give bounded state."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    return lw.join(rw, _attribution_cond(lw, rw, on, left_ts, right_ts,
                                         max_span), "inner")


def attribution_join_batch(left: DataFrame, right: DataFrame, on: str,
                           left_ts: str, right_ts: str,
                           max_span: str = "30 minutes") -> DataFrame:
    """The batch twin of :func:`stream_stream_attribution_join` (same
    condition, no watermarks) — the equivalence oracle: a stream-
    stream inner join with complete input must equal the batch join."""
    return left.join(right, _attribution_cond(left, right, on, left_ts,
                                              right_ts, max_span), "inner")
