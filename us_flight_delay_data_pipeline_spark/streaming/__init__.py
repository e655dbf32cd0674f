from .ingest import (
    stream_envelope_source,
    stream_silver,
    stream_silver_foreach_batch,
    stream_hourly_kpis,
    stream_dedup_envelopes,
)
from .sessions import sessionize_stream

__all__ = [
    "stream_envelope_source", "stream_silver",
    "stream_silver_foreach_batch", "stream_hourly_kpis",
    "stream_dedup_envelopes", "sessionize_stream",
]
