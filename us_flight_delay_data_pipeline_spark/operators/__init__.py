from .asof import asof_join
from .dedup import (
    dedup_exact,
    dedup_fingerprint,
    minhash_signatures,
    minhash_lsh_duplicate_pairs,
    simhash_64,
    simhash_duplicate_pairs,
    ngram_jaccard_pairs,
)
from .hashing import band_key, h32, h60, minhash_signature, rolling_fingerprint, simhash32
from .similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
    embedding_near_duplicates,
    hyperplane_bucket,
)

__all__ = [
    "asof_join",
    "dedup_exact", "dedup_fingerprint", "minhash_signatures",
    "minhash_lsh_duplicate_pairs", "simhash_64", "simhash_duplicate_pairs",
    "ngram_jaccard_pairs",
    "band_key", "h32", "h60", "minhash_signature", "rolling_fingerprint",
    "simhash32",
    "brute_force_topk", "lsh_bucketed_topk", "embedding_near_duplicates",
    "hyperplane_bucket",
]
