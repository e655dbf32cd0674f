"""Dump formatted physical plans for the flagship queries to
PLANS.md — the reviewable evidence that the 100 TB posture claims
hold: filters/columns pushed into scans, dimension joins broadcast,
top-k as TakeOrderedAndProject, aggregates partial+final, zero
BatchEvalPython in any hot path.

Usage: python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    ("monthly_trend", "flagship gold/trend aggregate"),
    ("filtered_projection", "pushdown: PushedFilters + pruned ReadSchema"),
    ("region_revenue", "dimension chain — all BroadcastHashJoin"),
    ("shipping_priority", "TPC-H Q3 shape with TakeOrderedAndProject"),
    ("min_cost_part_supplier", "groupwise-min via window, no sort-merge"),
    ("nation_revenue_share", "share-of-total with a single fact scan"),
    ("customers_without_orders", "anti join"),
    ("topk_orders", "top-k"),
    ("minhash_lsh_pairs", "LSH band self-join dedup"),
    ("dedup_clusters", "edges for iterative connected components"),
    ("envelope_silver_roundtrip", "silver path, no Python UDF"),
    ("monthly_revenue_reconciliation",
     "full outer reconciliation over pre-aggregated grains"),
    ("pretrain_funnel", "the end-to-end pretraining funnel"),
    ("sliding_window_counts", "sliding event-time windows (span/slide fan-out)"),
    ("user_value_trend",
     "Arrow-batched grouped custom aggregate (FlatMapGroupsInPandas)"),
    ("dq_expectations", "four DQ checks composed into one lazy plan"),
    ("returned_item_customers",
     "TPC-H Q10 shape — pushed returnflag filter, broadcast dims, "
     "TakeOrderedAndProject"),
    ("sole_failing_suppliers",
     "TPC-H Q21 shape — multi-EXISTS rewritten to one per-order "
     "aggregate, semi joins only"),
    ("jaccard_index_probe",
     "exact incremental dedup probe (inverted prefix index)"),
    ("pq_encode", "product quantization — broadcast codebook, "
     "map-side distances, argmin collect"),
    ("point_in_time_join", "feature-store temporal join — hash join "
     "+ validity filter, lead()-derived windows"),
    ("cdc_latest_state", "CDC log compaction — WindowGroupLimit "
     "partial top-1 before the key shuffle"),
    ("pagerank_trade_graph", "iterative PageRank — broadcast rank "
     "vector, decimal-exact contribution sums"),
    ("media_phash_dedup", "perceptual-hash image near-dup — integer "
     "Horner average-hash, 8x8-bit band equi-join, bit_count(xor) "
     "verify"),
    ("asof_latest_order", "as-of join — union + range-partitioned "
     "carry-forward merge, per-key cost linear in events+orders"),
    ("pack_sequences", "sequence packing — distributed two-pass "
     "prefix sum, no single-partition window"),
    ("txlog_time_travel", "transaction-log snapshots — four versions "
     "read as plain pruned parquet scans, log replay is metadata"),
    ("bpe_merges", "BPE merge learning — persisted vocab table, three "
     "broadcast argmax joins in one declarative plan"),
    ("bigram_lm_scores", "bigram-LM quality scoring — one token-stream "
     "scan, vocabulary-sized count tables re-aggregated from the "
     "persisted per-doc bigrams, integer-exact rational sums"),
    ("semantic_dedup", "SemDeDup — rebalanced cell assign, "
     "bucket-parallel in-cell all-pairs (no CPU-quadratic task skew), "
     "per-row norms so each pair pays one dot product"),
    ("length_curriculum", "exact quartile order statistics over the "
     "value histogram via distributed prefix sum, broadcast bucket "
     "assign"),
    ("balanced_stratified_sample", "data-derived per-stratum rates — "
     "tiny broadcast agg + map-side integer-exact filter"),
    ("ann_ivfpq_rerank_topk", "retrieve-then-rerank — PQ coarse rank "
     "from 8-byte codes, exact cosine only on the top-10 pool"),
    ("hybrid_rrf_topk", "hybrid retrieval — BM25 (broadcast df + "
     "query terms, persisted tf, decimal-routed contributions) fused "
     "with brute-force cosine by reciprocal rank; the fusion join is "
     "two query×20 lists"),
    ("classifier_crossshard_eval", "distillation round-trip — fit on "
     "hash-shard 0, frozen 1024-row weight table broadcast into "
     "shard 1's map-side scoring, confusion rollup"),
    ("semantic_dedup_capped", "bounded-leaf SemDeDup — hash-ring "
     "seed split of over-cap cells, per-leaf epsilon-ball dedup; "
     "N*cap work where the flat query is quadratic"),
    ("substring_dedup", "ExactSubstr ngram-run dedup — stride-1 gram "
     "hash shuffle, doc-partitioned islands window over marked "
     "positions only, text never shuffles"),
    ("user_value_trend_native", "native OLS twin — DECIMAL(38,0) "
     "normal equations, window + groupBy sharing one user_id hash "
     "partitioning"),
    ("salted_segment_revenue", "salted skew join — ShuffledHashJoin "
     "on (custkey, _salt), dim replicated 16x, no broadcast"),
    ("dsir_importance", "DSIR selection — one bucket-stats pass with "
     "map-side combine, 1024-row ratio table broadcast back"),
    ("ivf_recall_audit", "IVF trust gate — brute-force truth join + "
     "16-level explode, no cartesian"),
    ("pyds_envelope_counts", "custom Python DataSource scan — "
     "BatchScan sg_jsonl_envelope (Python), partition-per-file"),
    ("sorted_neighborhood_pairs", "sorted-neighborhood dedup — "
     "two-pass prefix rank + w-1 rank-offset equi-join (skew-immune "
     "window blocking)"),
    ("knn_graph_mutual", "kNN graph build — LSH-bucket self-join "
     "candidates, per-source WindowGroupLimit top-k, reversed-pair "
     "mutuality join"),
    ("chi2_drift_audit", "corpus-mix drift — one partial+final count "
     "agg, scalar totals broadcast, integer-exact decomposition"),
    ("nn_descent_round", "NN-Descent iteration — edge-table set "
     "algebra candidates (seed/reverse/2-hop), embeddings fetched by "
     "hash join, exact re-rank"),
    ("stream_sessions_state_gated", "custom Python state under the "
     "gate — FlatMapGroupsInPandasWithState drain (plan shown is the "
     "post-drain sink read; the streaming plan is in the module doc)"),
    ("monthly_spine_gapfill", "recursive CTE date spine — "
     "UnionLoop year recursion + vectorized month fan-out + "
     "broadcast spine join"),
    ("winnow_candidate_pairs", "winnowing-blocked near-dup pairs — "
     "wide hashing above the rebalance exchange, fold-per-row "
     "selection behind a Generate barrier, fingerprint equi-self-join "
     "with df<=16 boilerplate cap, relational containment verify"),
    ("bitext_margin_pairs", "margin-criterion bitext mining — "
     "LSH-bucket cross-side candidates, pair-endpoint windows, "
     "int64-exact margin over quantized cosines"),
    ("bloom_decontamination", "Bloom-filter decontamination — "
     "broadcast set-bit table, linear membership scan, exact verify "
     "alongside for FP accounting"),
    ("pareto_frontier_docs", "Pareto skyline — per-x max collapse, "
     "distributed prefix-max sweep, broadcast frontier join; no "
     "O(n^2) dominance join, no single-partition window"),
    ("group_mad_outliers", "median/MAD outliers — value-histogram "
     "discrete medians (map-side-combinable aggs + bounded "
     "distinct-value windows), raw rows never sort"),
    ("copurchase_clustering_coeff", "per-node triangle census — "
     "degree-ordered orientation, wedge + closing equi-joins, "
     "3-corner credit aggregate"),
]


def main(sf_dir: str = "/root/testdata/sf0.001",
         out_path: str = "PLANS.md") -> None:
    from us_flight_delay_data_pipeline_spark.queries import load_registry
    from us_flight_delay_data_pipeline_spark.session import get_spark

    spark = get_spark()
    reg = load_registry()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    chunks = [
        "# PLANS — formatted physical plans of flagship queries\n",
        f"Generated by `scripts/dump_plans.py` at `{sf_dir}`. "
        "Things to check per plan: `PushedFilters` / pruned `ReadSchema` "
        "on every scan, `BroadcastHashJoin` for dimension joins, "
        "`TakeOrderedAndProject` for top-k, paired partial/final "
        "`HashAggregate`, `WholeStageCodegen` spans, and the absence "
        "of `BatchEvalPython`.\n",
    ]
    for name, why in SHOWCASE:
        df = reg[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        assert "BatchEvalPython" not in plan, f"python in plan: {name}"
        chunks.append(f"## {name} — {why}\n\n```\n{plan}\n```\n")
    with open(out_path, "w") as fh:
        fh.write("\n".join(chunks))
    print(f"wrote {out_path} ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main(*sys.argv[1:])
