from .funnel import prepare_benchmark_shingles, stream_pretrain_funnel
from .ingest import (
    stream_envelope_source,
    stream_silver,
    stream_silver_foreach_batch,
    stream_hourly_kpis,
    stream_dedup_envelopes,
)
from .matview import compact_rollup, read_rollup, stream_monthly_revenue_log
from .sessions import sessionize_stream

__all__ = [
    "stream_envelope_source", "stream_silver",
    "stream_silver_foreach_batch", "stream_hourly_kpis",
    "stream_dedup_envelopes", "sessionize_stream",
    "stream_pretrain_funnel", "prepare_benchmark_shingles",
    "stream_monthly_revenue_log", "read_rollup", "compact_rollup",
]
# streaming.stateful (transformWithState v2) is intentionally not
# re-exported here: importing it is safe, but running it needs
# protobuf — import from the module directly.
