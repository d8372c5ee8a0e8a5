#!/usr/bin/env python3
"""Per-query scale-up analysis: compare two bench_full.json artifacts
(e.g. sf0.1 vs sf1) and flag queries whose runtime grew by more than
`factor` x the data growth — the super-linear candidates the scale
gate exists to catch.

Usage: python3 tools/scaling.py small.json big.json [data_ratio=10]
"""
import json
import sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

qs = small.get("queries", small)
qb = big.get("queries", big)
shared = sorted(set(qs) & set(qb))
rows = []
for name in shared:
    a, b = qs[name], qb[name]
    if a is None or b is None or a <= 0:
        continue
    rows.append((b / a, a, b, name))
rows.sort(reverse=True)
print(f"{len(shared)} shared queries; data ratio {data_ratio:g}x")
print(f"{'ratio':>7} {'small_s':>8} {'big_s':>8}  query")
for r, a, b, name in rows:
    flag = " <-- SUPER-LINEAR" if r > data_ratio * 1.5 and b > 2.0 else ""
    if r > data_ratio or flag:
        print(f"{r:7.2f} {a:8.2f} {b:8.2f}  {name}{flag}")
sub = [r for r, *_ in rows if r <= data_ratio]
print(f"\n{len(sub)}/{len(rows)} queries at-or-below linear "
      f"({data_ratio:g}x); median ratio "
      f"{sorted(r for r, *_ in rows)[len(rows)//2]:.2f}x")
