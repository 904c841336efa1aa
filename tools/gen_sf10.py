#!/usr/bin/env python3
"""Dev-only generator for the THIRD scaling decade / FIFTH correctness
decade: an sf10 dataset 10x target/sf1 (so 100x /root/testdata/sf0.1),
written under target/sf10.

Same discipline as gen_sf1.py, one level up: relational tables are
replicated 10x from the sf1 parquet with per-replica KEY OFFSETS whose
stride equals the sf1 key-space size (10x the sf0.1 strides), and
NATURAL keys are re-derived from the remapped surrogate keys
(c_name/s_name) so name-keyed dim joins keep exactly one row per name
— see gen_sf1.py's docstring for the fanout bug this prevents.
nation/region stay fixed-size dims; events keep the same one-month
window at 10x users.

documents/embeddings are re-generated at 10x size with gen_scale's
process, NOT replicated (cloning multiplies every near-dup cluster 10x
and measures a denser graph, not a bigger corpus). The same seed (7)
is used, so the doc stream is a strict prefix-extension of sf1's
corpus: the first 50k docs are byte-identical, the next 450k continue
the same generative world.

Usage: python3 tools/gen_sf10.py [src_dir] [out_dir]
       (defaults: target/sf1 -> target/sf10)

NOT part of the shipped library — generation + measurement only.
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import gen_scale

REPLICAS = 10

# table -> {column: stride} (stride = sf1 key-space size = 10x sf0.1's)
OFFSETS = {
    "customer": {"c_custkey": 150000},
    "supplier": {"s_suppkey": 10000},
    "part": {"p_partkey": 200000},
    "orders": {"o_orderkey": 1500000, "o_custkey": 150000},
    "lineitem": {"l_orderkey": 1500000, "l_partkey": 200000,
                 "l_suppkey": 10000},
    "events": {"event_id": 1000000, "user_id": 15000},
}
COPY = ["region", "nation"]

NAME_OF = {
    "customer": {"c_name": ("c_custkey", "Customer#{:09d}")},
    "supplier": {"s_name": ("s_suppkey", "Supplier#{:09d}")},
}


def replicate(src, name, out_dir):
    t = pq.read_table(f"{src}/{name}.parquet")
    # Shard-at-a-time append: lineitem at sf10 is 60M rows — writing
    # per-replica keeps memory bounded. Row-group size targets the
    # production ~32-row-group shape over the FULL 10x file (each
    # shard contributes ~3-4 groups), matching gen_scale.write_rg.
    import math
    rg_size = math.ceil(t.num_rows * REPLICAS / 32)
    writer = None
    for r in range(REPLICAS):
        cols = []
        keyed = {}
        for field in t.schema:
            col = t.column(field.name)
            off = OFFSETS[name].get(field.name)
            if off is not None and r > 0:
                col = pc.add(col, pa.scalar(off * r, field.type))
            keyed[field.name] = col
            cols.append(col)
        for nat, (key, fmt) in NAME_OF.get(name, {}).items():
            if r > 0:
                idx = t.column_names.index(nat)
                cols[idx] = pa.array(
                    [fmt.format(k) for k in keyed[key].to_pylist()],
                    type=t.schema.field(nat).type)
        shard = pa.table(dict(zip(t.column_names, cols)))
        if writer is None:
            writer = pq.ParquetWriter(f"{out_dir}/{name}.parquet",
                                      shard.schema)
        writer.write_table(shard, row_group_size=rg_size)
    writer.close()
    print(f"{name}: {t.num_rows} -> {t.num_rows * REPLICAS}")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "target/sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else "target/sf10"
    os.makedirs(out, exist_ok=True)
    for t in COPY:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"),
                       f"{out}/{t}.parquet")
        print(f"{t}: copied")
    for t in OFFSETS:
        replicate(src, t, out)
    rng = random.Random(7)
    gen_scale.write_rg(gen_scale.gen_docs(500000, rng),
                       f"{out}/documents.parquet")
    gen_scale.write_rg(gen_scale.gen_vecs(200000, 7),
                       f"{out}/embeddings.parquet")
    print("documents: 500000 generated; embeddings: 200000 generated")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
