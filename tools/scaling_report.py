#!/usr/bin/env python3
"""Dev-only: summarize the two scaling decades for PERF.md.

Reads SCALING.json (after tools/merge_scaling.py has folded decade 2
in) and prints, per decade: totals, the ratio distribution, and every
query with ratio > 7 on 10x data and large-side time > 0.5 s (the
near-superlinear watchlist — the hard flag in Scaling.scala is >10x).

Usage: python3 tools/scaling_report.py
"""
import json
import statistics

with open("SCALING.json") as f:
    d = json.load(f)


def report(tag, queries, small_k, large_k, tot_small, tot_large):
    rows = [(n, v[small_k], v[large_k], v["ratio"]) for n, v in queries.items()]
    ratios = [r for _, s, l, r in rows if s > 0 and l >= 0 and r >= 0]
    # Degenerate inputs (every query failed, or a zeroed small-side
    # total) must still print the FAILED list instead of raising
    # ZeroDivisionError/StatisticsError before reaching it.
    tot = (f"(ratio {tot_large / tot_small:.2f} on 10x data)"
           if tot_small > 0 else "(small-side total is 0 — no ratio)")
    print(f"== {tag}: n={len(rows)} total {tot_small} -> {tot_large} s {tot}")
    if ratios:
        print(f"   per-query ratio: median {statistics.median(ratios):.2f} "
              f"p90 {sorted(ratios)[int(.9 * len(ratios))]:.2f} max {max(ratios):.2f}")
    else:
        print("   per-query ratio: no usable measurements")
    watch = sorted((r for r in rows if r[3] > 7 and r[2] > 0.5),
                   key=lambda r: -r[3])
    fails = [n for n, s, l, r in rows if s < 0 or l < 0]
    for n, s, l, r in watch:
        flag = "SUPERLINEAR" if r > 10 else "watch"
        print(f"   {flag:11s} {n}: {s:.2f} -> {l:.2f} s ({r:.1f}x)")
    if fails:
        print(f"   FAILED: {fails}")


report("decade 1 (sf0.01 -> sf0.1)", d["queries"], "sf001", "sf01",
       d["total_sf001"], d["total_sf01"])
d2 = d.get("decade2")
if d2:
    report("decade 2 (sf0.1 -> sf1)", d2["queries"], "small", "large",
           d2["total_small"], d2["total_large"])
rg = d.get("decade2_rgtest")
if rg:
    report("decade 2 rgtest (32-row-group production shape, affected families)",
           rg["queries"], "small", "large",
           rg["total_small"], rg["total_large"])
