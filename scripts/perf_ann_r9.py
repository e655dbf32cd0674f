#!/usr/bin/env python3
"""Round-9 standalone triage (VERDICT r8 tasks #1 and #6), executed
FIRST thing in the round before the host warms into a drift phase:

- ann_ivfpq_residual_topk — 2.21 s (r7b) -> 11.15 s (r8c) with zero
  intervening ANN commits; the r8c session's controls were elevated
  (box 1.221, shuffle 3.9-4.0x) so host phase is suspected but was
  never SHOWN with a clean standalone record. Protocol: 3 isolated
  runs interleaved with BOTH control profiles, fresh JVM.
- semantic_dedup — 1.24 -> 1.87 s in the driver tail while the
  capped twin stayed flat; same standalone protocol.

Prints one JSON line with raw runs/medians, session control factors,
and box-normalized ratios vs the frozen r7b/r8b records."""
import json, os, statistics, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from us_flight_delay_data_pipeline_spark.operators.cache import release_tracked
from us_flight_delay_data_pipeline_spark.queries import load_registry
from us_flight_delay_data_pipeline_spark.session import get_spark
import bench

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="perf_ann_r9")
reg = load_registry()
bench.materialize(reg["monthly_trend"].fn(spark, sf_dir))  # JVM warmup

targets = ["ann_ivfpq_residual_topk", "semantic_dedup",
           "semantic_dedup_capped"]
controls = ["region_revenue", "text_stats", "segment_sales",
            "topk_orders", "sessionize_events", "customer_running_total"]
names = targets + controls
times = {n: [] for n in names}
for rnd in range(3):
    for n in names:
        t0 = time.time()
        bench.materialize(reg[n].fn(spark, sf_dir))
        times[n].append(round(time.time() - t0, 3))
        release_tracked(); spark.catalog.clearCache()
med = {n: round(statistics.median(v), 3) for n, v in times.items()}
ref = bench.control_reference(); sref = bench.shuffle_control_reference()
box = statistics.median(med[n] / ref[n] for n in ref)
sbox = statistics.median(med[n] / sref[n] for n in sref)
r7b = json.load(open("/root/repo/records/BENCH_local_r7b.json"))["queries"]
r8b = json.load(open("/root/repo/BENCH_local_r8b.json"))["queries"]
out = {"box_factor": round(box, 3), "box_factor_shuffle": round(sbox, 3),
       "controls": {n: med[n] for n in controls}}
for t in targets:
    m = med[t]
    out[t] = {
        "runs": times[t], "median_sec": m,
        "box_normalized": round(m / box, 3),
        "r7b_raw": r7b.get(t), "r8b_raw": r8b.get(t),
        "ratio_vs_r7b_raw": round(m / r7b[t], 3) if t in r7b else None,
        "ratio_vs_r8b_boxnorm":
            round((m / box) / r8b[t], 3) if t in r8b else None,
    }
print(json.dumps(out))
