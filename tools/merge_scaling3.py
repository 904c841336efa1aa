#!/usr/bin/env python3
"""Dev-only: fold the r18 decade-3 extension (the full 94-query sf10
gate set, r17 verdict task 5) into SCALING.json as `decade3_ext94`.

Inputs are FOUR graft.Bench detail files (the fresh-JVM batch
methodology BASELINE.md documents for sf1+: alphabetical halves, each
its own JVM, reps=2, seeded-random passes, noop sink, tmpfs shuffle
dirs, and since r18 the two-pole calibration probes with the validity
fields) — Bench rather than graft.tools.Scaling so every batch carries
per-rep attribution and its own window calibration on the record:

  bench/r18/d3ext_sf1_A.json   bench/r18/d3ext_sf1_B.json
  bench/r18/d3ext_sf10_A.json  bench/r18/d3ext_sf10_B.json

Ratios divide per-query medians measured in DIFFERENT JVMs (sf1 batch
vs sf10 batch); the per-batch stage-probe calib_median quantifies how
far apart those JVMs' windows were — the block records all four so a
flag adjudicator can normalize before re-running anything.

The four files were produced by HETEROGENEOUS binaries (r19 ADVICE):
d3ext_sf1_A predates both the warmup-exclusion in Bench's spreadOf and
the scan_branches field, so its committed calib_spread=1.602 /
window_flag=true is an all-points artifact (its first stage-probe point
carries the fresh-JVM JIT warm-up the later binaries exclude). Rather
than trust per-file fields, calib_spread and the flag are recomputed
UNIFORMLY here from each file's calibration array with the same rule
Bench has emitted since r18 (drop point 1 when 3+ points exist, then
max/min; flag at >= 1.3); the file's own committed values are kept
beside them as *_file for provenance. The recomputed flag is named
spread_flag, NOT window_flag (r19 ADVICE): it implements only the
spread leg of Bench's gate — the ratio leg is deliberately skipped
because the per-batch scan_stage_ratio values were all verified
in-band by hand, and recomputing it would need the (SF, branch-count)
signature maps duplicated here. scan_branches / scan_stage_ratio
are copied via .get (pre-field files record null) so the reader sees
the probe SHAPE before comparing scan medians across SFs — the sf1
batches ran 64-branch probes, the sf10 batches 8-branch, and
Bench.scala documents cross-shape scan numbers as not comparable.

Usage: python3 tools/merge_scaling3.py
"""
import json


def spread_of(cal):
    """Bench.spreadOf twin: warmup-excluded in-sweep max/min."""
    ts = [r["t"] for r in cal if r["t"] > 0]
    if len(ts) >= 3:
        ts = ts[1:]
    if len(ts) < 2:
        return -1.0
    return round(max(ts) / min(ts), 3)

BATCHES = {
    ("sf1", "A"): "bench/r18/d3ext_sf1_A.json",
    ("sf1", "B"): "bench/r18/d3ext_sf1_B.json",
    ("sf10", "A"): "bench/r18/d3ext_sf10_A.json",
    ("sf10", "B"): "bench/r18/d3ext_sf10_B.json",
}

detail = {k: json.load(open(p)) for k, p in BATCHES.items()}

med = {}          # (sf, name) -> median
for (sf, _b), d in detail.items():
    for name, row in d["queries"].items():
        med[(sf, name)] = row["median"]

names = sorted({n for (sf, n) in med if sf == "sf1"})
assert names == sorted({n for (sf, n) in med if sf == "sf10"}), \
    "sf1/sf10 batch query sets differ"

queries, superlinear = {}, []
for n in names:
    s, l = med[("sf1", n)], med[("sf10", n)]
    ratio = round(l / s, 3) if s > 0 and l >= 0 else -1.0
    queries[n] = {"small": s, "large": l, "ratio": ratio}
    # Same flag line as graft.tools.Scaling: cost grew faster than the
    # 10x data AND the large-side time is out of the noise floor.
    if s > 0 and l > 10 * s and l > 0.5:
        superlinear.append(n)

tot_s = sum(v["small"] for v in queries.values() if v["small"] >= 0)
tot_l = sum(v["large"] for v in queries.values() if v["large"] >= 0)
failed = sorted(n for n in names
                if med[("sf1", n)] < 0 or med[("sf10", n)] < 0)

block = {
    "small_dir": "target/sf1",
    "large_dir": "target/sf10",
    "reps": detail[("sf1", "A")]["reps"],
    "data_factor": 10,
    "n_queries": len(names),
    "total_small": round(tot_s, 3),
    "total_large": round(tot_l, 3),
    "total_ratio": round(tot_l / tot_s, 3),
    "failed": failed,
    "superlinear": sorted(superlinear),
    "batch_calib": {
        f"{sf}_{b}": {
            "calib_median": d["calib_median"],
            "calib_scan_median": d["calib_scan_median"],
            "scan_branches": d.get("scan_branches"),
            "scan_stage_ratio": d.get("scan_stage_ratio"),
            # uniform recompute (warmup-excluded, Bench r18 spreadOf
            # rule) across heterogeneous-binary files; committed
            # per-file values kept as *_file for provenance
            "calib_spread": sp,
            "spread_flag": sp >= 1.3,
            "calib_spread_file": d.get("calib_spread"),
            "window_flag_file": d.get("window_flag"),
        }
        for (sf, b), d in detail.items()
        for sp in [spread_of(d["calibration"])]
    },
    "note": ("r18 extension of decade3 to the full 94-query sf10 gate set "
             "(r17 verdict task 5). Fresh-JVM alphabetical-half batches per "
             "SF via Bench (8g, local[32], reps=2, tmpfs shuffle dirs); "
             "per-rep attribution + two-pole probes in bench/r18/d3ext_*. "
             "Supersedes nothing: decade3 (52-query, Scaling-main, one JVM "
             "both SFs) stays as the like-method historical row; this block "
             "is the gate-matching coverage row. batch_calib spreads/flags "
             "are recomputed uniformly (warmup-excluded) across the "
             "heterogeneous binaries; sf1_A's committed window_flag_file="
             "true is a pre-warmup-exclusion all-points artifact "
             "(recomputed spread 1.093, unflagged). spread_flag covers "
             "only the spread leg of Bench's gate (ratio leg verified "
             "in-band by hand, not recomputed)."),
    "queries": queries,
}

with open("SCALING.json") as f:
    top = json.load(f)
top.pop("decade3_ext94", None)
top["decade3_ext94"] = block
with open("SCALING.json", "w") as f:
    json.dump(top, f, separators=(",", ":"))
print(f"decade3_ext94: n={len(names)} total {tot_s:.1f} -> {tot_l:.1f} s "
      f"(ratio {tot_l / tot_s:.2f}) failed={failed} "
      f"superlinear={sorted(superlinear)}")
