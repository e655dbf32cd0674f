#!/usr/bin/env python3
"""Per-query bench regression reader.

BASELINE.md's rule: totals grow as coverage grows; a regression is a
PER-QUERY slowdown vs the recorded run, not a larger total. This
prints the per-query ratio table between two bench JSONs and flags
ratios beyond a threshold (default 1.5x), ignoring sub-0.3s queries
whose ratios are dominated by fixed overhead noise.

Usage: python scripts/compare_bench.py BASE.json NEW.json [threshold]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    base_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    base = json.load(open(base_path))["queries"]
    new = json.load(open(new_path))["queries"]

    shared = sorted(set(base) & set(new))
    ratios = []
    flagged = []
    for name in shared:
        b, n = base[name], new[name]
        if b <= 0:
            continue
        r = n / b
        ratios.append(r)
        if r >= threshold and max(b, n) >= 0.3:
            flagged.append((r, name, b, n))

    ratios.sort()
    med = ratios[len(ratios) // 2] if ratios else float("nan")
    print(f"shared queries: {len(shared)}  "
          f"added: {sorted(set(new) - set(base))}  "
          f"removed: {sorted(set(base) - set(new))}")
    print(f"median per-query ratio: {med:.2f}x  threshold: {threshold}x")
    for r, name, b, n in sorted(flagged, reverse=True):
        print(f"FLAG {name}: {b:.2f}s -> {n:.2f}s ({r:.2f}x)")
    if not flagged:
        print("no per-query regressions at threshold")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
