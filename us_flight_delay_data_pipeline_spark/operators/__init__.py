from .dedup import (
    dedup_exact,
    dedup_fingerprint,
    minhash_signatures,
    minhash_lsh_duplicate_pairs,
    simhash_64,
    simhash_duplicate_pairs,
    ngram_jaccard_pairs,
)
from .similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
    embedding_near_duplicates,
)
from .asof import asof_join

__all__ = [
    "dedup_exact", "dedup_fingerprint", "minhash_signatures",
    "minhash_lsh_duplicate_pairs", "simhash_64", "simhash_duplicate_pairs",
    "ngram_jaccard_pairs",
    "brute_force_topk", "lsh_bucketed_topk", "embedding_near_duplicates",
    "asof_join",
]
