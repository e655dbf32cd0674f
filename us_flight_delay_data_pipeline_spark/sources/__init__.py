from .registry import TABLES, load_table, load_all, register_views
from .envelope import (
    encode_envelope,
    decode_envelope,
    csv_to_envelope_batch,
    write_envelope_bronze,
    read_envelope_bronze,
)

__all__ = [
    "TABLES", "load_table", "load_all", "register_views",
    "encode_envelope", "decode_envelope", "csv_to_envelope_batch",
    "write_envelope_bronze", "read_envelope_bronze",
]
