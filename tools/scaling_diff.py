#!/usr/bin/env python3
"""Per-query scaling analysis between two bench_out.json dumps at different
scale factors. Usage: scaling_diff.py <bench_small.json> <bench_big.json>
<data_ratio>

Prints queries sorted by time ratio (big/small) descending, flagging any
whose growth exceeds the data ratio (super-linear suspects). Sub-second
small-side timings are noisy — fixed per-query overhead (JVM, planning,
streaming checkpoint setup) dominates at tiny SF, so ratios well BELOW the
data ratio are expected; ratios ABOVE it are what matter."""
import json
import sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
ratio = float(sys.argv[3])

qs, qb = small["queries"], big["queries"]
rows = []
for name in sorted(qs):
    if name not in qb or qs[name] <= 0 or qb[name] <= 0:
        continue
    rows.append((qb[name] / qs[name], qs[name], qb[name], name))

rows.sort(reverse=True)
print(f"{'ratio':>7} {'small_s':>8} {'big_s':>8}  query   (data ratio {ratio}x)")
flagged = 0
for r, s, b, name in rows:
    flag = " <-- SUPER-LINEAR" if r > ratio else ""
    if flag:
        flagged += 1
    if flag or r > ratio * 0.5 or rows.index((r, s, b, name)) < 25:
        print(f"{r:7.2f} {s:8.3f} {b:8.3f}  {name}{flag}")
print(f"\n{len(rows)} queries compared; {flagged} super-linear "
      f"(ratio > {ratio}); totals {small['value']:.1f}s -> {big['value']:.1f}s")
