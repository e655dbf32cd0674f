#!/usr/bin/env python3
"""Scale-stress bench (VERDICT r2 task #2): run a cross-family sample
of registered queries at the recorded baseline SF (single-row-group
sf0.1) AND at the make_scale_data.py 10x multi-file/multi-row-group
copy, and record per-query scaling factors to BENCH_scale.json.

Reading the factors: data grows 10x, so a perfectly linear operator
with zero fixed overhead shows factor ~10; in practice most queries
sit WELL below 10 because local-mode fixed overhead (JVM job launch,
planning, Python round-trips) dominates at sf0.1. Factors
meaningfully above the replica count flag super-linear behavior —
those become perf bugs for the next round.

Usage: python scripts/bench_scale.py [base_dir] [scale_dir] [out.json]
         [--replicas=N] [--queries=a,b,c] [--noop]

--replicas sets the recorded replica count and the super-linear
threshold (default 10). --queries restricts to a subset (the 100x run
uses the strictly-linear-critical families; iterative graph operators
are round-count-dominated and already shown sub-linear at 10x).
--noop materializes through the noop sink instead of collect() —
mandatory at 100x, where per-doc outputs would bottleneck on the
driver transfer rather than the cluster-side plan being measured.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from us_flight_delay_data_pipeline_spark.session import get_spark

# one query per major plan family; streaming_gated excluded (drain
# overhead dominates, data volume is not the knob there)
SCALE_QUERIES = [
    # scan/agg/sort
    "monthly_trend", "segment_sales", "topk_orders", "overall_kpis",
    # joins: broadcast, shuffled, semi, theta, as-of
    "region_revenue", "top_suppliers", "customer_order_stats",
    "price_band_orders", "asof_latest_order",
    # windows / sessions / prefix sums
    "customer_running_total", "sessionize_events", "events_hourly",
    "pack_sequences", "user_value_trend_native",
    # skew + salting
    "salted_event_type_stats",
    # text / dedup family
    "text_stats", "dedup_exact", "doc_fingerprints",
    "minhash_lsh_pairs", "substring_dedup", "dedup_clusters_star",
    "sorted_neighborhood_pairs",
    # weighted sampling + drift (map-side + tiny aggs)
    "quality_weighted_sample", "chi2_drift_audit",
    # ANN / embeddings
    "ann_bruteforce_topk", "ann_ivf_topk", "pq_encode",
    "knn_graph_mutual",
    # iterative graph
    "pagerank_trade_graph",
    # round-3 wave-5/6 additions (VERDICT r3 task #4): the newest
    # heavy curation queries need recorded scale factors too
    "knn_semantic_clusters", "nn_descent_round", "cluster_aware_folds",
    "winnow_candidate_pairs", "bloom_decontamination",
    # round-4 additions (VERDICT r4 task #2): the classifier twins and
    # the gated streaming pair. The gated streams pay a fixed drain
    # overhead (micro-batch scheduling) that data volume doesn't
    # control, so read their factors against that floor — what the
    # 10x run must prove is that per-batch STATE work (dedup keys,
    # classifier scoring) doesn't scale super-linearly.
    "quality_classifier_scores", "stream_classifier_scores_gated",
    "stream_dedup_watermark_gated",
]


def run_all(spark, queries, names, sf_dir: str, reps: int = 2,
            noop: bool = False) -> dict:
    out = {}
    for name in names:
        fn = queries[name]
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            if noop:
                # full execution, zero driver-side result transfer —
                # required at 100x where per-doc outputs (text_stats,
                # minhash signatures) would bottleneck on collect()
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"  {name}: {best:.2f}s", flush=True)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) if "=" in a else (a[2:], "1")
                for a in sys.argv[1:] if a.startswith("--"))
    base = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    scale = args[1] if len(args) > 1 else "/tmp/sg_scale10"
    out_path = args[2] if len(args) > 2 else "BENCH_scale.json"
    replicas = int(opts.get("replicas", "10"))
    noop = "noop" in opts
    names = (opts["queries"].split(",") if "queries" in opts
             else SCALE_QUERIES)
    spark = get_spark()
    queries = entrymod.queries()
    print(f"== base: {base}", flush=True)
    t_base = run_all(spark, queries, names, base, noop=noop)
    print(f"== scale: {scale}", flush=True)
    t_scale = run_all(spark, queries, names, scale, noop=noop)
    factors = {q: (round(t_scale[q] / t_base[q], 2) if t_base[q] else None)
               for q in t_base}
    doc = {
        "base_dir": base, "scale_dir": scale, "replicas": replicas,
        "base_s": t_base, "scale_s": t_scale, "factor": factors,
        "superlinear": sorted(q for q, f in factors.items()
                              if f is not None and f > replicas),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps({"superlinear": doc["superlinear"]}, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
