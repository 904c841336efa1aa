#!/usr/bin/env python3
"""Dev-only generator for the SECOND scaling decade (round-10 verdict
task 1): an sf1 dataset 10x /root/testdata/sf0.1, written under
target/sf1 (the testdata tree is read-only).

Relational tables are replicated 10x with per-replica KEY OFFSETS and
matching foreign-key remaps — every key stride equals the sf0.1 key-
space size, so join fanout, selectivities, and value distributions are
preserved exactly (each replica is a disjoint shard of the same
generative world; TPC-H itself scales this way: linear entity counts,
fixed dims). NATURAL keys must be remapped along with surrogate keys:
`c_name` is `Customer#%09d` of the custkey and the ETL pipelines join
dims BY NAME (the reference's lookup is name-keyed), so a replica that
offsets `c_custkey` but copies `c_name` gives 10 customers per name
and every name-keyed dim join fans out 10x — that bug shipped in the
first r13 decade-2 run and produced phantom superlinear flags on the
cartera/ventas loads (PERF.md r13); NAME_OF regenerates the name from
the offset key. nation/region stay fixed-size dims. Event timestamps keep
the same one-month window: 10x users at the same per-user density, so
sessionization scales in users, not in session length.

documents/embeddings are NOT replicated — cloning would multiply every
near-dup cluster 10x and measure a denser graph, not a bigger corpus
(same reasoning as gen_scale.py). They are re-generated at 10x size
with gen_scale.py's process (the same generative family the driver's
tables use: vocab sentences + 20% word-perturbed near-dups, unit
normal 64-dim vectors, label = id % 10).

Usage: python3 tools/gen_sf1.py [out_dir]   (default target/sf1)

NOT part of the shipped library — generation + measurement only.
"""
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import gen_scale

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# table -> {column: stride} (stride = sf0.1 key-space size)
OFFSETS = {
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000,
                 "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 1500},
}
COPY = ["region", "nation"]

# table -> {natural-key column: (surrogate-key column, format)} — string
# identities derived from a remapped key must be re-derived, not copied.
NAME_OF = {
    "customer": {"c_name": ("c_custkey", "Customer#{:09d}")},
    "supplier": {"s_name": ("s_suppkey", "Supplier#{:09d}")},
}


def replicate(name, out_dir):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    shards = []
    for r in range(REPLICAS):
        cols = []
        keyed = {}
        for field in t.schema:
            col = t.column(field.name)
            off = OFFSETS[name].get(field.name)
            if off is not None and r > 0:
                col = pa.compute.add(col, pa.scalar(off * r, field.type))
            keyed[field.name] = col
            cols.append(col)
        for nat, (key, fmt) in NAME_OF.get(name, {}).items():
            if r > 0:
                idx = t.column_names.index(nat)
                cols[idx] = pa.array(
                    [fmt.format(k) for k in keyed[key].to_pylist()],
                    type=t.schema.field(nat).type)
        shards.append(pa.table(dict(zip(t.column_names, cols))))
    big = pa.concat_tables(shards)
    rg = gen_scale.write_rg(big, f"{out_dir}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {big.num_rows} (rg_size={rg})")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "target/sf1"
    import os
    os.makedirs(out, exist_ok=True)
    for t in COPY:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{out}/{t}.parquet")
        print(f"{t}: copied")
    for t in OFFSETS:
        replicate(t, out)
    rng = random.Random(7)
    gen_scale.write_rg(gen_scale.gen_docs(50000, rng),
                       f"{out}/documents.parquet")
    gen_scale.write_rg(gen_scale.gen_vecs(20000, 7),
                       f"{out}/embeddings.parquet")
    print(f"documents: 50000 generated; embeddings: 20000 generated")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
