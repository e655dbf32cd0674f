"""Vector math over ``array<float>`` embedding columns — the [EXT]
similarity-search building blocks (SURVEY.md §7 step 7).

Implemented with ``zip_with``/``aggregate`` higher-order functions:
fully JVM-side, codegen-friendly, no Python worker round-trip. At
100 TB this is the difference between a scan-bound job and a
serialization-bound one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["vec_dot", "vec_norm", "cosine_similarity"]


def vec_dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length float arrays → double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def vec_norm(a: Column) -> Column:
    """L2 norm → double."""
    return F.sqrt(F.aggregate(
        a, F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double"),
    ))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm
    (same zero-guard contract as ``safe_div``)."""
    denom = vec_norm(a) * vec_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(vec_dot(a, b) / denom)
