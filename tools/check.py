#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Usage: python3 tools/check.py [--json OUT.json] <verify_out_dir> <sf_dir> [query ...]

--json writes a driver-CORRECTNESS-format artifact (per-query
rows_match/schema_match/hash_match/spark_rows/oracle_rows/err) so
builder-side sweeps at other scale factors (sf0.001/sf0.1/sf1) land in
the same shape the judge reads for sf0.01.

Reads each <out_dir>/<name>/ parquet (Spark result) and runs the matching
oracle SQL from <out_dir>/oracle_sql.json in DuckDB over the sf_dir parquet
tables, then compares row count, schema (column names), and a hash of the
values with columns sorted by name and rows sorted by all columns.

NOT part of the shipped library (the engine is Scala/Spark only); this
mirrors what the driver's t2 harness does so we can iterate locally.
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cell(v):
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (np.floating,)):
        return repr(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(cell(x) for x in v) + "]"
    return str(v)


def col_cells(s: pd.Series):
    """Render one column dtype-faithfully.

    iterrows() upcasts mixed-dtype rows to float64, canonicalizing int 150
    and float 150.0 to the same string and masking int-vs-float oracle
    divergence (e.g. DuckDB HUGEINT -> pandas float64). Rendering per
    column keeps each column's own dtype, mirroring the driver's hash.
    """
    if pd.api.types.is_float_dtype(s):
        return ["NULL" if pd.isna(v) else repr(float(v)) for v in s]
    if pd.api.types.is_integer_dtype(s):
        # nullable Int64 (pyarrow-backed reads) can carry pd.NA, which
        # int() raises on; render it NULL like the float branch does
        return ["NULL" if pd.isna(v) else str(int(v)) for v in s]
    return [cell(v) for v in s]


def table_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    cols = [col_cells(df[c]) for c in df.columns]
    for i in range(len(df)):
        h.update(("|".join(col[i] for col in cols)).encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    out_dir, sf_dir = argv[0], argv[1]
    only = set(argv[2:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    report = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    names = sorted(
        p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json"))
    n_pass = n_fail = n_skip = 0
    for name in names:
        if only and name not in only:
            continue
        spark_df = pd.concat(
            [pd.read_parquet(p) for p in glob.glob(f"{out_dir}/{name}/*.parquet")],
            ignore_index=True) if glob.glob(f"{out_dir}/{name}/*.parquet") else pd.DataFrame()
        if name not in oracle:
            print(f"  [skip] {name}: no oracle (rows={len(spark_df)})")
            n_skip += 1
            continue
        try:
            ddb_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(spark_df),
                            "oracle_rows": None, "err": f"oracle SQL error: {e}"}
            n_fail += 1
            continue
        s, d = canon(spark_df), canon(ddb_df)
        problems = []
        if list(s.columns) != list(d.columns):
            problems.append(f"schema spark={list(s.columns)} ddb={list(d.columns)}")
        if len(s) != len(d):
            problems.append(f"rows spark={len(s)} ddb={len(d)}")
        report[name] = {"rows_match": len(s) == len(d),
                        "schema_match": list(s.columns) == list(d.columns),
                        "hash_match": False,
                        "spark_rows": len(s), "oracle_rows": len(d), "err": None}
        if not problems and table_hash(s) != table_hash(d):
            neq = (s.astype(str) != d.astype(str))
            bad_cols = [c for c in s.columns if neq[c].any()]
            problems.append(f"hash mismatch in cols {bad_cols}")
            for c in bad_cols[:2]:
                i = neq[c].idxmax()
                problems.append(f"  e.g. row {i} col {c}: spark={s[c][i]!r} ddb={d[c][i]!r}")
        if problems:
            print(f"  [FAIL] {name}: " + "; ".join(problems))
            report[name]["err"] = "; ".join(problems)
            n_fail += 1
        else:
            print(f"  [ok]   {name} ({len(s)} rows)")
            report[name]["hash_match"] = True
            n_pass += 1
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(f"wrote {json_out} ({len(report)} entries)")
    print(f"pass={n_pass} fail={n_fail} skip(no-oracle)={n_skip}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
