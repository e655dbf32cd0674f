#!/usr/bin/env python3
"""Round-8 standalone re-check of asof_prev_part_shipment (VERDICT r7
task #3): 3 isolated runs interleaved with both control profiles,
executed at round start before the host warms into a drift phase.
Prints one JSON line with raw medians and control-normalized ratios
vs the frozen r2/r6c records."""
import json, os, statistics, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from us_flight_delay_data_pipeline_spark.operators.cache import release_tracked
from us_flight_delay_data_pipeline_spark.queries import load_registry
from us_flight_delay_data_pipeline_spark.session import get_spark
import bench

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="perf_asof_r8")
reg = load_registry()
bench.materialize(reg["monthly_trend"].fn(spark, sf_dir))  # JVM warmup

names = ["asof_prev_part_shipment", "region_revenue", "text_stats",
         "segment_sales", "topk_orders", "sessionize_events",
         "customer_running_total"]
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
r6c = json.load(open("/root/repo/records/BENCH_local_r6c.json"))["queries"]
r7b = json.load(open("/root/repo/records/BENCH_local_r7b.json"))["queries"]
a = med["asof_prev_part_shipment"]
print(json.dumps({
    "asof_median_sec": a, "asof_runs": times["asof_prev_part_shipment"],
    "box_factor": round(box, 3), "box_factor_shuffle": round(sbox, 3),
    "asof_box_normalized": round(a / box, 3),
    "r6c_raw": r6c.get("asof_prev_part_shipment"),
    "r7b_raw": r7b.get("asof_prev_part_shipment"),
    "ratio_vs_r6c_raw": round(a / r6c["asof_prev_part_shipment"], 3),
    "ratio_vs_r6c_boxnorm": round((a / box) / r6c["asof_prev_part_shipment"], 3),
    "controls": med,
}))
