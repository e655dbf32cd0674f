"""Tracked persists for shared query-builder intermediates.

Several query builders persist a shared intermediate that more than
one downstream plan references (the kNN edge table, the winnowing
candidate table, signature tables). Inside the bench/driver harness
that residency is bounded by the caller contract — ``spark.catalog.
clearCache()`` after every query unpersists all cached DataFrames —
but a library user composing these builders in a long-lived session
had no narrower hook than nuking the whole cache.

``track(df)`` registers a builder-created persist; ``release_tracked``
unpersists everything registered (idempotent, safe if the harness
already cleared the cache). Builders keep working under the old
clearCache-only contract; the registry just adds the precise hook.

Note this covers only ``persist()`` storage. ``localCheckpoint``
blocks are NOT cache entries — clearCache never frees them — which is
why the iterative operators release those explicitly through
``operators/ckpt.py`` instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["track", "release_tracked"]

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register a builder-created persisted DataFrame for later
    release; returns it unchanged so call sites can wrap in place."""
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked DataFrame (non-blocking). Returns how
    many were released. Safe to call repeatedly or after a harness
    clearCache — unpersist on an uncached DataFrame is a no-op."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist(False)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    _TRACKED.clear()
    return n
