#!/usr/bin/env python3
"""Per-query bench regression reader, box-speed normalized.

BASELINE.md's rule: totals grow as coverage grows; a regression is a
PER-QUERY slowdown vs the recorded run, not a larger total. The
sandbox host additionally drifts 1.3-1.5x between rounds (PERF_r4.md),
so raw cross-round ratios are meaningless: each bench JSON carries a
``box_factor`` (median ratio of four frozen control queries vs their
round-2 records — emitted by bench.py), and this script divides every
per-query ratio by (new box_factor / base box_factor) BEFORE flagging.
A JSON predating the field falls back to computing the factor from
its own recorded control-query timings, then to 1.0.

Prints the normalized ratio table between two bench JSONs and flags
ratios beyond a threshold (default 1.5x), ignoring sub-0.3s queries
whose ratios are dominated by fixed overhead noise.

Usage: python scripts/compare_bench.py BASE.json NEW.json [threshold]
"""

from __future__ import annotations

import json
import statistics
import sys

# must match bench.py's fallback control records (round-2 box)
CONTROL_R2_SEC = {"region_revenue": 0.898, "text_stats": 0.457,
                  "segment_sales": 0.437, "topk_orders": 0.133}
# shuffle-profile controls (bench.py SHUFFLE_CONTROL_R2_SEC): a
# shuffle-throughput host shift moves shuffle-dense queries without
# moving the scan-bound controls, so a query is flagged only when it
# regresses under BOTH normalizations (VERDICT r6 task #4)
SHUFFLE_CONTROL_R2_SEC = {"sessionize_events": 0.447,
                          "customer_running_total": 0.414}


def _factor(doc: dict, field: str, controls: dict[str, float]) -> float:
    """The JSON's recorded host-speed factor, else derive it from its
    own control-query timings, else 1.0."""
    if doc.get(field):
        return float(doc[field])
    q = doc.get("queries", {})
    ratios = sorted(q[n] / r for n, r in controls.items()
                    if n in q and r > 0)
    return round(statistics.median(ratios), 3) if ratios else 1.0


def box_factor(doc: dict) -> float:
    return _factor(doc, "box_factor", CONTROL_R2_SEC)


def shuffle_factor(doc: dict) -> float:
    return _factor(doc, "box_factor_shuffle", SHUFFLE_CONTROL_R2_SEC)


def main() -> int:
    base_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    base_doc = json.load(open(base_path))
    new_doc = json.load(open(new_path))
    base = base_doc["queries"]
    new = new_doc["queries"]

    bf_base, bf_new = box_factor(base_doc), box_factor(new_doc)
    norm = bf_new / bf_base if bf_base > 0 else 1.0
    sf_base, sf_new = shuffle_factor(base_doc), shuffle_factor(new_doc)
    snorm = sf_new / sf_base if sf_base > 0 else 1.0
    print(f"box factors: base {bf_base}  new {bf_new}  "
          f"normalizing new/base ratios by {norm:.3f}")
    print(f"shuffle factors: base {sf_base}  new {sf_new}  "
          f"shuffle-normalizing by {snorm:.3f}")

    shared = sorted(set(base) & set(new))
    ratios = []
    flagged = []
    for name in shared:
        b, n = base[name], new[name]
        if b <= 0:
            continue
        r = (n / b) / norm
        rs = (n / b) / snorm
        ratios.append(r)
        # a real regression exceeds the threshold under BOTH host
        # profiles; one-profile-only excursions are host drift in
        # that profile, not a plan change
        if min(r, rs) >= threshold and max(b, n) >= 0.3:
            flagged.append((min(r, rs), name, b, n, r, rs))

    ratios.sort()
    med = ratios[len(ratios) // 2] if ratios else float("nan")
    print(f"shared queries: {len(shared)}  "
          f"added: {sorted(set(new) - set(base))}  "
          f"removed: {sorted(set(base) - set(new))}")
    print(f"median box-normalized per-query ratio: {med:.2f}x  "
          f"threshold: {threshold}x (must exceed under both profiles)")
    for _, name, b, n, r, rs in sorted(flagged, reverse=True):
        print(f"FLAG {name}: {b:.2f}s -> {n:.2f}s "
              f"({r:.2f}x scan-normalized, {rs:.2f}x shuffle-normalized)")
    if not flagged:
        print("no per-query regressions at threshold "
              "(dual-profile normalized)")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
