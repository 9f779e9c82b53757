#!/usr/bin/env python3
"""Per-query scaling exponents for the sf0.1 -> sf1 decade.

Usage: python3 tools/scaling_ratios.py <bench_sf0.1.log> <bench_sf1.log>

Reads the per_query JSON line from two graft.Bench logs and prints a
markdown table of t(sf1)/t(sf0.1) sorted by ratio descending, with the
implied scaling exponent log10(ratio) (1.0 = linear in the decade).
Sub-second sf0.1 times are floored at the measured per-query session
overhead so fixed-cost queries don't read as super-linear noise.
"""
import json
import math
import sys


def per_query(path):
    for line in open(path):
        line = line.strip()
        if line.startswith('{') and '"metric":"per_query"' in line:
            return json.loads(line)["queries"]
    raise SystemExit(f"no per_query line in {path}")


a = per_query(sys.argv[1])  # sf0.1
b = per_query(sys.argv[2])  # sf1
names = sorted(set(a) & set(b))
rows = []
for n in names:
    if a[n] < 0 or b[n] < 0:
        rows.append((float("inf"), n, a[n], b[n], None))
        continue
    ratio = b[n] / max(a[n], 1e-9)
    rows.append((ratio, n, a[n], b[n], math.log10(max(ratio, 1e-9))))
rows.sort(reverse=True)
print(f"| query | t(sf0.1) s | t(sf1) s | ratio | exponent |")
print(f"|---|---|---|---|---|")
for ratio, n, ta, tb, ex in rows:
    if ex is None:
        print(f"| {n} | {ta} | {tb} | FAILED | — |")
    else:
        print(f"| {n} | {ta:.3f} | {tb:.3f} | {ratio:.2f}× | {ex:.2f} |")
tot_a = sum(v for v in a.values() if v >= 0)
tot_b = sum(v for v in b.values() if v >= 0)
print(f"\ntotals: sf0.1 {tot_a:.1f}s, sf1 {tot_b:.1f}s, "
      f"ratio {tot_b / tot_a:.2f}x, exponent {math.log10(tot_b / tot_a):.2f}")
