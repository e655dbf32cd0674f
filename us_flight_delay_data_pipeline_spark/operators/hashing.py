"""Portable hashing expression kit shared by the dedup/similarity
operators.

All hashes are built from md5 (first 15 hex digits → 60-bit int) so an
external SQL engine (the DuckDB oracle, or any warehouse) can
reproduce them bit-for-bit — xxhash64/murmur would be faster but
engine-specific. The 32-bit reduction keeps every downstream
``a*h + b`` inside int64 (no silent overflow divergence between
engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "h60", "h32", "P61", "FP_PRIME", "minhash_signature",
    "simhash32", "band_key", "rolling_fingerprint",
]

P61 = (1 << 61) - 1          # MinHash universal-hash modulus
FP_PRIME = 2147483647        # rolling-fingerprint modulus (2^31-1)
_H32 = 1 << 32
SIMHASH_BITS = 32


def h60(c: Column) -> Column:
    """First 15 hex digits of md5 as bigint — portable 60-bit hash."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def h32(c: Column) -> Column:
    return h60(c) % F.lit(_H32)


def minhash_signature(shingles: Column,
                      coeffs: list[tuple[int, int]]) -> Column:
    """k-way MinHash signature (array<bigint>) in ONE pass over the
    shingle array.

    Single ``aggregate`` with an array accumulator — the md5 token hash
    is computed once per shingle. (A per-function ``array_min``
    formulation recomputes the hash k× because Catalyst's
    CollapseProject inlines the shared subexpression into every
    min-column and HOF bodies get no codegen CSE — measured 15× slower
    at sf0.1.)
    """
    coef_a = F.array(*[F.lit(a).cast("bigint") for a, _ in coeffs])
    coef_b = F.array(*[F.lit(b).cast("bigint") for _, b in coeffs])
    hs = F.transform(shingles, h32)
    init = F.array_repeat(F.lit(P61).cast("bigint"), len(coeffs))
    return F.aggregate(
        hs, init,
        lambda acc, h: F.transform(
            acc,
            lambda m, i: F.least(
                m, (F.element_at(coef_a, i + 1) * h
                    + F.element_at(coef_b, i + 1)) % F.lit(P61)),
        ),
    )


def simhash32(tokens: Column) -> Column:
    """32-bit SimHash over a token array, one pass.

    Accumulator = 32-element vote array updated per token; bit i of
    the token hash is extracted with an integer ``h & 2^i`` test (pure
    int64 ops — the earlier ``floor(h / 2^i) % 2`` double formulation
    was exact too, but FP divide + floor + mod per bit per token was
    measurably slower than one AND + compare). A final fold turns
    positive votes into bits. md5 computed once per token.
    """
    hs = F.transform(tokens, h32)
    bitvals = F.array(*[F.lit(1 << b).cast("bigint") for b in range(SIMHASH_BITS)])
    votes = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("bigint"), SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc, bitvals,
            lambda c, p: c + F.when(h.bitwiseAND(p) > 0, 1).otherwise(-1)),
    )
    return F.aggregate(
        F.zip_with(votes, bitvals,
                   lambda v, bv: F.when(v > 0, bv).otherwise(F.lit(0).cast("bigint"))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def band_key(sig: Column, band: int, rows_per_band: int = 4) -> Column:
    """LSH band bucket key: ``rows_per_band`` consecutive signature
    values rendered as a short string (portable join key)."""
    return F.concat_ws(",", F.transform(
        F.slice(sig, band * rows_per_band + 1, rows_per_band),
        lambda v: v.cast("string")))


def rolling_fingerprint(tokens: Column) -> Column:
    """Order-sensitive polynomial rolling hash over token hashes:
    fold(h=0: (h*31 + h32(tok)) mod 2^31-1). Reordered-token documents
    get different prints (unlike MinHash/SimHash)."""
    hs = F.transform(tokens, h32)
    return F.aggregate(
        hs, F.lit(0).cast("bigint"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(FP_PRIME),
    )
