#!/usr/bin/env python3
"""Summarize a `pytest --durations=0 -vv`-style log: per-file call-time
totals and the top individual tests — the data behind the r10 `slow`
marking (fast default profile, VERDICT r9 item 3).

Usage: python scripts/analyze_test_durations.py PYTEST_LOG [top_n]
"""
import re
import sys
from collections import defaultdict

log = open(sys.argv[1]).read()
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
# lines like: "12.34s call     tests/test_foo.py::test_bar[param]"
pat = re.compile(r"^\s*(\d+\.\d+)s\s+(call|setup|teardown)\s+(\S+)",
                 re.MULTILINE)
per_file = defaultdict(float)
rows = []
for m in pat.finditer(log):
    sec, phase, node = float(m.group(1)), m.group(2), m.group(3)
    f = node.split("::")[0]
    per_file[f] += sec
    if phase == "call":
        rows.append((sec, node))
print("== per-file totals (call+setup+teardown) ==")
for f, s in sorted(per_file.items(), key=lambda kv: -kv[1]):
    print(f"{s:8.1f}s  {f}")
print(f"\n== top {top_n} individual test calls ==")
for sec, node in sorted(rows, reverse=True)[:top_n]:
    print(f"{sec:8.1f}s  {node}")
print(f"\ntotal accounted: {sum(per_file.values()):.0f}s "
      f"across {len(rows)} calls")
