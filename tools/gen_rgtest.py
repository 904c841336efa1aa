#!/usr/bin/env python3
"""Dev-only: production-file-shape twin of the sf0.1 / sf1 dirs.

SUPERSEDED in r16: gen_scale/gen_sf1/gen_sf10 now write the ~32-row-
group production shape by default (gen_scale.write_rg), so the rgtest
twin is only needed for the driver's read-only /root/testdata dirs.
Kept for history and for reshaping testdata sf0.1 when measuring
decade 2.

The driver's parquet (and gen_sf1.py's) write each table as ONE file
with ONE row group — so a Spark scan gets exactly one task no matter
how large the table, and every narrow per-row stage downstream runs on
one core. Production parquet has ~128 MB row groups, i.e. scan
parallelism grows with data. This script rewrites each table with 32
row groups (same rows, same order) so the decade-2 superlinear flags
can be re-measured under production file shape: if a flagged query's
ratio collapses to ~10x (and its absolute time drops ~cores-fold), the
flag was the fixture's file shape, not the operator's plan.

Usage: python3 tools/gen_rgtest.py [src dst [src dst ...]]
With no args, writes target/rgtest/sf0.1 and target/rgtest/sf1.
"""
import math
import os
import sys

import pyarrow.parquet as pq

PAIRS = [("/root/testdata/sf0.1", "target/rgtest/sf0.1"),
         ("target/sf1", "target/rgtest/sf1")]
if len(sys.argv) > 1:
    argv = sys.argv[1:]
    assert len(argv) % 2 == 0, "args must be src dst pairs"
    PAIRS = list(zip(argv[::2], argv[1::2]))
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

for src, dst in PAIRS:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        # Tiny dims (region: 5, nation: 25) stay ONE row group — a
        # ceil-div rg_size of 1 would make one row group per ROW, which
        # is not the documented ~32-row-group production shape either.
        # Threshold is <= 32 (the dims actually targeted are 5/25 rows):
        # a 33+-row table gets the ceil-div multi-row-group shape.
        if tbl.num_rows <= 32:
            rg = tbl.num_rows or 1
        else:
            rg = math.ceil(tbl.num_rows / 32)
        pq.write_table(tbl, f"{dst}/{t}.parquet", row_group_size=rg)
        print(f"{dst}/{t}: {tbl.num_rows} rows, rg_size={rg}")
