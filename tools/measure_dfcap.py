#!/usr/bin/env python3
"""Dev-only (r14 verdict task 3): MEASURE the df-cap bounding the
pair-graph family's candidate growth, instead of asserting it.

The r13 decade-2 audit measured candidate pairs growing 81.9x on 10x
docs (fixed-vocab fixture: df per shingle grows ~linearly with corpus
size, so sum C(df,2) grows ~quadratically) and ASSERTED that the
ShingleDfCap (128) "only starts binding at sf1 (max df 129) and bounds
the next decade". This script turns that into a measurement: replicate
the sf1 documents K times (K = 1,2,4,8 — df scales exactly Kx, the
fixed-vocab density trajectory continued two more doublings past the
cap) and compute, with the EXACT oracle shingle recipe (word-3-gram,
polyhash 31/8191 mod 1e9+7, list_distinct per doc, corpus = documents
UNION exact copies %7 UNION trailer near-copies %11):

  uncapped candidates  sum C(df, 2)            -- what a capless join pays
  capped candidates    sum C(min(df,128), 2)   -- what the shipped join pays
  dropped shingles / postings                  -- dedup_shingle_dfcap's report

Expected if the cap does its job: uncapped grows ~K^2; capped growth
flattens toward (and below) linear-in-K once the df mass crosses 128,
because a saturated shingle contributes a constant C(128,2) no matter
how hot it gets.

Writes target/dfcap/x{K}/documents.parquet (K>1) so the Spark-side
dedup_shingle_dfcap query can be driven against the same fixtures.

Usage: python3 tools/measure_dfcap.py [sf1_documents_dir]
"""
import os
import sys

import duckdb
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "target/sf1"
CAP = 128
MOD = 1000000007
TRAILER = " near duplicate trailer appended for dedup testing"

POLY = ("list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {MOD})")
COMBINE = f"(((hs[i] * 8191 + hs[i + 1]) % {MOD}) * 8191 + hs[i + 2]) % {MOD}"
SHINGLES = (f"CASE WHEN len(hs) >= 3 THEN list_distinct(list_transform("
            f"generate_series(1, len(hs) - 2), i -> {COMBINE})) ELSE [] END")


def metrics(con, docs_rel):
    return con.execute(f"""
        WITH corpus AS (
          SELECT doc_id, text FROM {docs_rel}
          UNION ALL SELECT doc_id + 1000000, text FROM {docs_rel} WHERE doc_id % 7 = 0
          UNION ALL SELECT doc_id + 2000000, text || '{TRAILER}' FROM {docs_rel} WHERE doc_id % 11 = 0),
        ix AS (
          SELECT doc_id, unnest(s) AS h FROM (
            SELECT doc_id, {SHINGLES} AS s FROM (
              SELECT doc_id, list_transform(
                regexp_split_to_array(lower(trim(text)), '\\s+'),
                tok -> {POLY}) AS hs
              FROM corpus))),
        dfs AS (SELECT h, count(*) AS df FROM ix GROUP BY h)
        SELECT count(*)                              AS n_shingles,
               sum(df)                               AS postings,
               max(df)                               AS max_df,
               sum(df * (df - 1) // 2)               AS uncapped_pairs,
               sum(least(df, {CAP}) * (least(df, {CAP}) - 1) // 2) AS capped_pairs,
               sum(CASE WHEN df > {CAP} THEN 1 ELSE 0 END)  AS dropped_shingles,
               sum(CASE WHEN df > {CAP} THEN df ELSE 0 END) AS dropped_postings
        FROM dfs""").fetchone()


con = duckdb.connect()
con.execute(f"CREATE VIEW d1 AS SELECT doc_id, text FROM read_parquet('{SRC}/documents.parquet')")
n_docs = con.execute("SELECT count(*), max(doc_id) FROM d1").fetchone()
print(f"base: {SRC} docs={n_docs[0]} max_doc_id={n_docs[1]}")

rows = []
for k in (1, 2, 4, 8):
    # K replicas with 10M-stride doc_id offsets (clear of the corpus
    # CTE's +1M/+2M offsets); offsets are multiples of 7*11 so every
    # replica keeps the same %7 / %11 copy membership as the base.
    offs = [i * 10_010_000 for i in range(k)]
    sel = " UNION ALL ".join(
        f"SELECT doc_id + {o} AS doc_id, text FROM d1" for o in offs)
    con.execute(f"CREATE OR REPLACE VIEW dk AS {sel}")
    if k > 1:
        out = f"target/dfcap/x{k}"
        os.makedirs(out, exist_ok=True)
        con.execute(f"COPY (SELECT * FROM dk ORDER BY doc_id) TO "
                    f"'{out}/documents.parquet' (FORMAT PARQUET)")
    m = metrics(con, "dk")
    rows.append((k,) + m)
    print(f"x{k}: shingles={m[0]} postings={m[1]} max_df={m[2]} "
          f"uncapped={m[3]} capped={m[4]} "
          f"dropped_shingles={m[5]} dropped_postings={m[6]}")

b = rows[0]
print("\ngrowth vs x1 (docs grow Kx):")
print(f"{'K':>3} {'uncapped':>10} {'capped':>10} {'postings':>10}")
for r in rows:
    print(f"{r[0]:>3} {r[4] / b[4]:>9.1f}x {r[5] / b[5]:>9.1f}x {r[2] / b[2]:>9.1f}x")
