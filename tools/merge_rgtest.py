#!/usr/bin/env python3
"""Dev-only (r14 verdict task 4): fold the production-file-shape
decade-2 run into SCALING.json as the `decade2_rgtest` block.

The standing `decade2` block measures sf0.1 -> sf1 on the driver-shape
fixtures (ONE row group per table -> scan parallelism 1), which
confounds per-doc scorers and the ETL family with a file-shape
artifact the r13 audit adjudicated in PERF.md prose only. This makes
the confound-free ratios machine-readable: tools/gen_rgtest.py writes
32-row-group twins of both dirs, graft.tools.Scaling sweeps the
affected families over them (SMALL=target/rgtest/sf0.1,
LARGE=target/rgtest/sf1, OUT=SCALING_RGTEST.json), and this script
attaches the result.

Usage: python3 tools/merge_rgtest.py
"""
import json

with open("SCALING.json") as f:
    d = json.load(f)
with open("SCALING_RGTEST.json") as f:
    rg = json.load(f)

d.pop("decade2_rgtest", None)
d["decade2_rgtest"] = {
    "small_dir": "target/rgtest/sf0.1",
    "large_dir": "target/rgtest/sf1",
    "note": "32-row-group production-file-shape twins (tools/gen_rgtest.py); "
            "subset = the families the one-row-group shape confounds "
            "(ETL pipelines + per-doc text scorers), PERF.md r13 bucket 2",
    "reps": rg["reps"],
    "data_factor": rg["data_factor"],
    "total_small": rg["total_sf001"],
    "total_large": rg["total_sf01"],
    "total_ratio": rg["total_ratio"],
    "superlinear": rg["superlinear"],
    "queries": {
        name: {"small": v["sf001"], "large": v["sf01"], "ratio": v["ratio"]}
        for name, v in rg["queries"].items()
    },
}
with open("SCALING.json", "w") as f:
    json.dump(d, f, separators=(",", ":"))
print(f"merged decade2_rgtest: n={len(d['decade2_rgtest']['queries'])} "
      f"ratio={d['decade2_rgtest']['total_ratio']} "
      f"superlinear={d['decade2_rgtest']['superlinear']}")
