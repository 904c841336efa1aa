#!/usr/bin/env python3
"""Staged-execution variant of check.py for oracles whose CTE chain
out-spills DuckDB at big scale factors.

Usage: python3 tools/check_staged.py <verify_out_dir> <sf_dir> <query> <cte_to_stage> [--json OUT]

Runs the SAME oracle SQL as check.py, but splits it at the named CTE
boundary: everything up to and including <cte_to_stage> is materialized
ONCE into a temp table, then the remainder runs against it. This is a
pure execution-strategy change (DuckDB re-evaluates multiply-referenced
CTE subtrees; at sf1 the simultaneous spills of N copies exceed the
box's disk) — the SQL text of both halves is byte-identical to the
committed oracle, so the compared semantics are unchanged.

Motivating case (r15): graph_common_neighbors at sf1 — the kept-graph
is tiny (27.6k vertices, max degree 9, 20.5k wedges) but the oracle
ran out of 77 GB of temp disk because the shingle→pair chain above
`kept` was being spilled once per downstream reference. Staging `kept`
runs the query in minutes.
"""
import sys, json
import duckdb
import pandas as pd

sys.path.insert(0, __import__('os').path.dirname(__file__))
from check import TABLES, canon, table_hash


def main():
    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    out_dir, sf_dir, name, stage_cte = args

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    # Split at the named CTE: "<head>,\n<stage_cte> AS (<body>),\n<tail>".
    # The stage point is the start of the NEXT CTE definition after it.
    marker = f"{stage_cte} AS ("
    start = oracle.index(marker)
    # find the comma that closes this CTE: scan for balanced parens
    depth = 0
    i = start + len(marker) - 1  # at the '('
    while True:
        if oracle[i] == "(":
            depth += 1
        elif oracle[i] == ")":
            depth -= 1
            if depth == 0:
                break
        i += 1
    head = oracle[:start]  # "WITH a AS (...)," prefix (ends with comma/WS)
    body = oracle[start + len(marker):i]
    tail = oracle[i + 1:].lstrip().lstrip(",").strip()
    if not head.rstrip().upper().startswith("WITH"):
        raise SystemExit(f"CTE split failed: head does not start with WITH")

    con = duckdb.connect()
    con.execute("SET temp_directory='.tmp'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    # stage: materialize the prefix chain once
    head_sql = head.rstrip().rstrip(",")
    con.execute(f"CREATE TEMP TABLE {stage_cte} AS {head_sql} {body}")
    # remainder: the tail CTEs now read the temp table by the same name
    rest_sql = ("WITH " + tail) if " AS (" in tail.split("SELECT")[0] else tail
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
    print(f"  [{status}] {name} staged@{stage_cte} "
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
