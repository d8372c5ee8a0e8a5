#!/usr/bin/env python3
"""Per-query wall-time extraction from a graft.Verify output directory:
Verify writes each query's parquet dir sequentially, so consecutive
completion mtimes bound each query's runtime. Useful for scale-gate
analysis when the run wasn't benchmarked (e.g. the sf1 sweep).

Caveats: the FIRST query of a JVM run absorbs session startup; a gap
row after a crash/restart absorbs dead time — both are flagged when
the gap exceeds `--restart-gap` seconds.

Usage: python3 tools/verify_times.py /tmp/verify_sf1 [top_n]
"""
import os
import sys

out = sys.argv[1]
top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
restart_gap = 600.0

rows = []
for q in os.listdir(out):
    p = os.path.join(out, q)
    if os.path.isdir(p) and os.path.exists(os.path.join(p, "_SUCCESS")):
        rows.append((os.path.getmtime(os.path.join(p, "_SUCCESS")), q))
rows.sort()
durs = []
for i in range(1, len(rows)):
    dt = rows[i][0] - rows[i - 1][0]
    flag = " [gap/restart]" if dt > restart_gap else ""
    durs.append((dt, rows[i][1], flag))
durs.sort(reverse=True)
print(f"{len(rows)} completed queries; top {top} by wall time:")
for dt, q, flag in durs[:top]:
    print(f"{dt:8.1f}s  {q}{flag}")
clean = [d for d, _, f in durs if not f]
print(f"\nsum(clean)={sum(clean):.0f}s  median={sorted(clean)[len(clean)//2]:.1f}s")
