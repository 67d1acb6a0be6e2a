#!/usr/bin/env python3
"""10x scale-ratio table from two Bench sidecars (sf0.1 vs sf1).

Usage: python3 tools/ratio.py BENCH_DETAIL_sf01.json BENCH_DETAIL_sf1.json
Prints a markdown table sorted by ratio desc + summary stats.
Sidecar entries may be bare seconds (pre-round-11) or {"sec": ...} objects.
"""
import json, sys, statistics

def load(p):
    d = json.load(open(p))
    out = {}
    for k, v in d["queries"].items():
        sec = v["sec"] if isinstance(v, dict) else float(v)
        out[k] = float(sec)
    return out

a, b = load(sys.argv[1]), load(sys.argv[2])
shared = sorted(set(a) & set(b))
rows = [(k, a[k], b[k], (b[k] / a[k]) if a[k] > 0 else float("inf"))
        for k in shared if a[k] >= 0 and b[k] >= 0]
rows.sort(key=lambda r: -r[3])
print("| query | sf0.1 s | sf1 s | ratio |")
print("|---|---|---|---|")
for k, x, y, r in rows[:15]:
    print(f"| {k} | {x:.2f} | {y:.2f} | {r:.2f}x |")
ratios = [r[3] for r in rows]
ta, tb = sum(r[1] for r in rows), sum(r[2] for r in rows)
print(f"\nqueries={len(rows)} suite sf0.1={ta:.1f}s sf1={tb:.1f}s "
      f"suite_ratio={tb/ta:.2f}x median={statistics.median(ratios):.2f}x "
      f"over5x={sum(1 for r in ratios if r > 5)} "
      f"over10x={sum(1 for r in ratios if r > 10)}")
