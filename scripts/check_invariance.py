#!/usr/bin/env python3
"""Full-registry partition-invariance audit (the one-off behind
INVARIANCE_r2.log, now a repeatable script): every registered query
must return IDENTICAL canonicalized values under 32 vs 7 shuffle
partitions (coprime, so every hash distribution changes). The
15-query risk sample runs per-commit in
tests/test_partition_invariance.py; this sweeps everything.

Usage: python scripts/check_invariance.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_flight_delay_data_pipeline_spark.queries import load_registry
from us_flight_delay_data_pipeline_spark.session import get_spark


def _canon(df):
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()

    def cell(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else v
        if isinstance(v, list):
            return tuple(v)
        return v

    return sorted([tuple(cell(r[c]) for c in cols) for r in rows],
                  key=repr)


def _cells_within(brow, orow, rtol: float) -> bool:
    if len(brow) != len(orow):
        return False
    for b, o in zip(brow, orow):
        if isinstance(b, (int, float)) and isinstance(o, (int, float)) \
                and not isinstance(b, bool) and not isinstance(o, bool):
            if abs(b - o) > rtol * max(1.0, abs(b), abs(o)):
                return False
        elif b != o:
            return False
    return True


def _within_rtol(base, other, rtol: float) -> bool:
    """Approximate multiset equality for sketch-estimate queries
    (QuerySpec.invariance_rtol > 0): every base row must match a
    distinct other row with non-numeric cells exactly equal and
    numeric cells within the relative tolerance. Greedy bipartite
    matching — positional pairing after sorting does NOT work here,
    because sorting on a drifting estimate column misaligns rows
    relative to their exact key columns. O(n²), fine for the
    bounded-output sketch queries this gate covers."""
    if len(base) != len(other):
        return False
    remaining = list(other)
    for brow in base:
        for i, orow in enumerate(remaining):
            if _cells_within(brow, orow, rtol):
                del remaining[i]
                break
        else:
            return False
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    reg = load_registry()
    names = sys.argv[2:] or sorted(reg)
    n_ok = n_fail = 0
    for name in names:
        t0 = time.monotonic()
        try:
            base = _canon(reg[name].fn(spark, sf_dir))
            old = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            try:
                narrow = _canon(reg[name].fn(spark, sf_dir))
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", old)
            spark.catalog.clearCache()
            dt = time.monotonic() - t0
            rtol = getattr(reg[name], "invariance_rtol", 0.0)
            if base == narrow:
                n_ok += 1
                print(f"ok   {name} ({dt:.1f}s)", flush=True)
            elif rtol and _within_rtol(base, narrow, rtol):
                n_ok += 1
                print(f"ok   {name} (sketch estimate within rtol="
                      f"{rtol}) ({dt:.1f}s)", flush=True)
            else:
                n_fail += 1
                print(f"FAIL {name}: {len(base)} vs {len(narrow)} rows "
                      f"or value drift ({dt:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    print(f"\n{n_ok} invariant, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
