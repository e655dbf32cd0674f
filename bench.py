#!/usr/bin/env python3
"""Benchmark harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is materialized through the ``noop`` sink (full execution,
no driver-side collect) — wall-clock is median of N_RUNS after one
JVM/plan warmup of the first query.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from us_flight_delay_data_pipeline_spark.queries import load_registry
from us_flight_delay_data_pipeline_spark.session import get_spark

N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")
    reg = load_registry()

    # JVM / codegen warmup on the flagship query
    materialize(reg["monthly_trend"].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, spec in sorted(reg.items()):
        runs = []
        for _ in range(N_RUNS):
            t0 = time.time()
            materialize(spec.fn(spark, sf_dir))
            runs.append(time.time() - t0)
        # queries may persist() intermediates (signature tables, silver
        # materialization); drop them so later queries are measured
        # cold and the session doesn't accumulate 60+ caches
        spark.catalog.clearCache()
        timings[name] = round(statistics.median(runs), 3)
        print(f"# {name}: {timings[name]}s (runs: {[round(r,2) for r in runs]})",
              file=sys.stderr)

    total = round(sum(timings.values()), 3)
    audit_names = sorted(n for n, s in reg.items() if s.audit)
    print(json.dumps({
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # calibration audits (recall sweeps, band tuning) are not
        # serving queries — split the subtotals so serving throughput
        # is comparable across rounds as audits are added
        "serving_total_sec": round(sum(
            t for n, t in timings.items() if n not in audit_names), 3),
        "audit_total_sec": round(sum(
            t for n, t in timings.items() if n in audit_names), 3),
        "audit_queries": audit_names,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
