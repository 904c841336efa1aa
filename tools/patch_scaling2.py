#!/usr/bin/env python3
"""Dev-only: fold a partial decade-2 re-run into SCALING2.json.

After a round changes query code, the standing decade-2 sweep
(SCALING2.json, full registry) carries stale timings for the changed
queries. Re-running the whole 25-minute sweep for a 16-query delta is
waste; instead run graft.tools.Scaling restricted to the changed set
(SPARK_GRAFT_SCALING_ONLY=..., OUT=<patch file>) and fold it in here:
per-query entries are replaced, totals and the superlinear list are
recomputed from the patched per-query table (totals = sum of medians,
flag = ratio > 10 and large > 0.5 s, mirroring Scaling.scala).

Usage: python3 tools/patch_scaling2.py <patch.json>
Then re-run tools/merge_scaling.py to rebuild SCALING.json's decade2.
"""
import json
import sys

patch_file = sys.argv[1]
with open("SCALING2.json") as f:
    d = json.load(f)
with open(patch_file) as f:
    p = json.load(f)

for name, v in p["queries"].items():
    if name not in d["queries"]:
        raise SystemExit(f"patch has unknown query {name}")
    d["queries"][name] = v

ok = {n: v for n, v in d["queries"].items()
      if v["sf001"] >= 0 and v["sf01"] >= 0}
d["total_sf001"] = round(sum(v["sf001"] for v in ok.values()), 3)
d["total_sf01"] = round(sum(v["sf01"] for v in ok.values()), 3)
d["total_ratio"] = round(d["total_sf01"] / d["total_sf001"], 3)
d["superlinear"] = sorted(
    n for n, v in ok.items() if v["ratio"] > 10 and v["sf01"] > 0.5)

with open("SCALING2.json", "w") as f:
    json.dump(d, f, separators=(",", ":"))
print(f"patched {len(p['queries'])} queries: total "
      f"{d['total_sf001']} -> {d['total_sf01']} s "
      f"(ratio {d['total_ratio']}), superlinear={d['superlinear']}")
