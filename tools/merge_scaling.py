#!/usr/bin/env python3
"""Dev-only: fold the second-decade scaling run into SCALING.json.

Inputs: SCALING.json (decade 1, full registry, sf0.01->sf0.1 — written
by graft.tools.Scaling with default env) and SCALING2.json (decade 2,
full registry, sf0.1->target/sf1 — Scaling with SMALL/LARGE/OUT env
overrides). Output: SCALING.json with the decade-2 block under
"decade2", so the standing artifact carries both 10x steps for every
query (the 100x claim = two measured decades).

Usage: python3 tools/merge_scaling.py
"""
import json

with open("SCALING.json") as f:
    d1 = json.load(f)
with open("SCALING2.json") as f:
    d2 = json.load(f)

d1.pop("decade2", None)
d1["decade2"] = {
    # dirs come from the run itself when present (Scaling.scala records
    # them since r16); the literals are the pre-r16 defaults.
    "small_dir": d2.get("small_dir", "/root/testdata/sf0.1"),
    "large_dir": d2.get("large_dir", "target/sf1"),
    "reps": d2["reps"],
    "data_factor": d2["data_factor"],
    "total_small": d2["total_sf001"],
    "total_large": d2["total_sf01"],
    "total_ratio": d2["total_ratio"],
    "superlinear": d2["superlinear"],
    "queries": {
        name: {"small": v["sf001"], "large": v["sf01"], "ratio": v["ratio"]}
        for name, v in d2["queries"].items()
    },
}
with open("SCALING.json", "w") as f:
    json.dump(d1, f, separators=(",", ":"))
print(f"merged: decade1 n={len(d1['queries'])} ratio={d1['total_ratio']}, "
      f"decade2 n={len(d1['decade2']['queries'])} "
      f"ratio={d1['decade2']['total_ratio']} "
      f"superlinear2={d1['decade2']['superlinear']}")
