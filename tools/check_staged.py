#!/usr/bin/env python3
"""Staged-execution variant of check.py for oracles whose CTE chain
out-spills DuckDB at big scale factors.

Usage: python3 tools/check_staged.py <verify_out_dir> <sf_dir> <query> <cte_to_stage>
           [--chunk-col COL --chunks N] [--json OUT]

Runs the SAME oracle SQL as check.py, but materializes the CTE chain up
to and including <cte_to_stage> into temp tables (each preceding CTE
once, in order), then runs the byte-identical remainder against them.
This is a pure execution-strategy change (DuckDB re-evaluates
multiply-referenced CTE subtrees; at sf1 the simultaneous spills of N
copies exceed the box's disk) — the SQL text of every CTE body and of
the remainder is unchanged, so the compared semantics are unchanged.

--chunk-col/--chunks additionally materializes the staged CTE itself in
N passes, appending `WHERE <col> % N = i` to its body. This is only
sound when <col> is a row-wise key of the staged CTE — every window
function in the body must PARTITION BY it (filtering whole partitions
before or after a per-partition window is identical). Used when the
staged CTE's own intermediate (e.g. a vectors×centroids cross join
carrying embedding lists) exceeds memory in a single pass.

Motivating cases:
 - r15, graph_common_neighbors at sf1 — the kept-graph is tiny (27.6k
   vertices, max degree 9) but the oracle ran out of 77 GB of temp disk
   because the shingle→pair chain above `kept` was being spilled once
   per downstream reference. Staging `kept` runs the query in minutes.
 - r15, sim_ann_ivf at sf10 — `assigned` ranks 200k vectors × 448
   centroids; the cross join carries two 64-double lists per row
   (~90 GB resident), OOMing even with a temp directory because list
   payloads pin memory through the window sort. `assigned` partitions
   its window by vec_id, so --chunk-col vec_id --chunks 16 builds it
   in 12.5k-vector slices.
"""
import sys, json
import duckdb
import pandas as pd

sys.path.insert(0, __import__('os').path.dirname(__file__))
from check import TABLES, canon, table_hash


def split_ctes(sql):
    """Parse `WITH [RECURSIVE] a [(cols)] AS (...), ... <final select>`
    into (recursive_flag, [(name, cols_or_None, body), ...],
    final_select) with a balanced-paren scanner (bodies contain nested
    parens and commas)."""
    s = sql.strip()
    assert s[:4].upper() == "WITH", "oracle is not a WITH query"
    i = 4
    recursive = False
    if s[i:].lstrip()[:9].upper() == "RECURSIVE":
        i = s.index("RECURSIVE", i) + len("RECURSIVE")
        recursive = True
    ctes = []

    def scan_parens(k):
        depth, m = 0, k
        while True:
            if s[m] == "(":
                depth += 1
            elif s[m] == ")":
                depth -= 1
                if depth == 0:
                    return m
            m += 1

    while True:
        # skip whitespace/commas
        while s[i] in " \t\n\r,":
            i += 1
        # read name (may abut its column list)
        j = i
        while s[j] not in " \t\n\r(":
            j += 1
        name = s[i:j]
        while s[j] in " \t\n\r":
            j += 1
        cols = None
        if s[j] == "(":  # optional column list: name (a, b) AS (...)
            m = scan_parens(j)
            cols = s[j:m + 1]
            j = m + 1
        k = s.index("(", j)
        kw = " ".join(s[j:k].split())
        assert kw.upper() in ("AS", "AS MATERIALIZED", "AS NOT MATERIALIZED"), \
            f"bad CTE header at {name!r}: {kw!r}"
        m = scan_parens(k)
        ctes.append((name, cols, kw, s[k + 1:m]))
        i = m + 1
        while s[i] in " \t\n\r":
            i += 1
        if s[i] != ",":
            return recursive, ctes, s[i:]


def main():
    args = [a for a in sys.argv[1:]]
    json_out = None
    chunk_col, chunks = None, 1
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    if "--chunk-col" in args:
        i = args.index("--chunk-col")
        chunk_col = args[i + 1]
        del args[i:i + 2]
    if "--chunks" in args:
        i = args.index("--chunks")
        chunks = int(args[i + 1])
        del args[i:i + 2]
    out_dir, sf_dir, name, stage_cte = args

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    recursive, ctes, final = split_ctes(oracle)
    names = [n for n, _, _, _ in ctes]
    assert stage_cte in names, f"{stage_cte!r} not among CTEs {names}"
    cut = names.index(stage_cte)
    prefix = "WITH RECURSIVE " if recursive else "WITH "

    con = duckdb.connect()
    con.execute("SET temp_directory='.tmp'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    # Materialize every CTE up to the staged one, in order; temp tables
    # shadow nothing (no base table shares a CTE name) and later bodies
    # resolve earlier names to the temp tables. Each CTE is re-wrapped
    # as a single-CTE WITH of the SAME name so column-list renames and
    # recursive self-references keep their original resolution; the body
    # text is unchanged.
    for n, cols, kw, body in ctes[: cut + 1]:
        if n == stage_cte and chunk_col and chunks > 1:
            assert cols is None, "chunking a column-list CTE is unsupported"
            con.execute(
                f"CREATE TEMP TABLE {n} AS SELECT * FROM ({body}\n) q WHERE 1=0")
            for c in range(chunks):
                con.execute(
                    f"INSERT INTO {n} {body}\nWHERE {chunk_col} % {chunks} = {c}")
                print(f"    staged chunk {c + 1}/{chunks} of {n}", flush=True)
        else:
            con.execute(
                f"CREATE TEMP TABLE {n} AS {prefix}{n} {cols or ''} {kw} ({body}) "
                f"SELECT * FROM {n}")
            print(f"    staged {n}", flush=True)
    tail = ctes[cut + 1:]
    rest_sql = final if not tail else (
        prefix + ", ".join(f"{n} {cols or ''} {kw} ({b})" for n, cols, kw, b in tail)
        + " " + final)
    ddb_df = con.execute(rest_sql).fetchdf()

    import glob
    spark_df = pd.concat(
        [pd.read_parquet(p) for p in glob.glob(f"{out_dir}/{name}/*.parquet")],
        ignore_index=True)
    s, d = canon(spark_df), canon(ddb_df)
    ok_schema = list(s.columns) == list(d.columns)
    ok_rows = len(s) == len(d)
    ok_hash = ok_schema and ok_rows and table_hash(s) == table_hash(d)
    status = "ok" if (ok_schema and ok_rows and ok_hash) else "FAIL"
    chunk_note = f" chunked {chunk_col}%{chunks}" if chunk_col else ""
    print(f"  [{status}] {name} staged@{stage_cte}{chunk_note} "
          f"(spark={len(s)} ddb={len(d)} schema={ok_schema} hash={ok_hash})")
    if json_out:
        json.dump({name: {"rows_match": ok_rows, "schema_match": ok_schema,
                          "hash_match": ok_hash, "spark_rows": len(s),
                          "oracle_rows": len(d),
                          "err": None if ok_hash else f"staged@{stage_cte} mismatch"}},
                  open(json_out, "w"), indent=2)
    sys.exit(0 if ok_hash else 1)


if __name__ == "__main__":
    main()
