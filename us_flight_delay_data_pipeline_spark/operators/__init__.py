from .asof import asof_join
from .components import connected_components
from .dedup import (
    dedup_exact,
    dedup_fingerprint,
    minhash_signatures,
    minhash_lsh_duplicate_pairs,
    simhash_64,
    simhash_duplicate_pairs,
    ngram_jaccard_pairs,
    build_minhash_index,
    dedup_against_index,
)
from .kmeans import assign_clusters, inertia, kmeans_fit
from .maintenance import compact_parquet, table_file_stats
from .hashing import band_key, h32, h60, minhash_signature, rolling_fingerprint, simhash32
from .similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
    embedding_near_duplicates,
    hyperplane_bucket,
    assign_ivf_cells,
    build_ivf_index,
    probe_ivf_index,
)
from .skew import (
    salted_groupby_agg,
    replicate_for_salted_join,
    all_pairs_within_block,
)
from .upsert import merge_upsert, scd2_apply, upsert_partitioned_parquet

__all__ = [
    "asof_join",
    "connected_components",
    "dedup_exact", "dedup_fingerprint", "minhash_signatures",
    "minhash_lsh_duplicate_pairs", "simhash_64", "simhash_duplicate_pairs",
    "ngram_jaccard_pairs", "build_minhash_index", "dedup_against_index",
    "assign_clusters", "inertia", "kmeans_fit",
    "compact_parquet", "table_file_stats",
    "band_key", "h32", "h60", "minhash_signature", "rolling_fingerprint",
    "simhash32",
    "brute_force_topk", "lsh_bucketed_topk", "embedding_near_duplicates",
    "hyperplane_bucket", "assign_ivf_cells", "build_ivf_index",
    "probe_ivf_index",
    "salted_groupby_agg", "replicate_for_salted_join",
    "all_pairs_within_block",
    "merge_upsert", "scd2_apply", "upsert_partitioned_parquet",
]
