#!/usr/bin/env python3
"""Staged-execution variant of check.py for oracles whose CTE chain
out-spills DuckDB at big scale factors.

Usage: python3 tools/check_staged.py <verify_out_dir> <sf_dir> <query> <cte_to_stage>
           [--chunk-col COL --chunks N] [--json OUT] [--db FILE [--reuse]]

Runs the SAME oracle SQL as check.py, but materializes the CTE chain up
to and including <cte_to_stage> into temp tables (each preceding CTE
once, in order), then runs the byte-identical remainder against them.
This is a pure execution-strategy change (DuckDB re-evaluates
multiply-referenced CTE subtrees; at sf1 the simultaneous spills of N
copies exceed the box's disk) — the SQL text of every CTE body and of
the remainder is unchanged, so the compared semantics are unchanged.

--chunk-col/--chunks additionally materializes the staged CTE itself in
N passes, appending `WHERE ((<col> % N) + N) % N = i` (NULL keys land
in pass 0) to its body. This is only
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


def skip_inert(s, m):
    """If position m starts a SQL string literal, quoted identifier, or
    comment, return the index just past it; else return m. Keeps the
    paren scanner and the top-level keyword scanner from being fooled
    by parens/keywords inside 'literals', \"idents\", -- or /* */."""
    if s[m] == "'" or s[m] == '"':
        q = s[m]
        m += 1
        while True:
            if s[m] == q:
                if s[m:m + 2] == q + q:  # doubled-quote escape
                    m += 2
                    continue
                return m + 1
            m += 1
    if s[m:m + 2] == "--":
        nl = s.find("\n", m)
        return len(s) if nl < 0 else nl + 1
    if s[m:m + 2] == "/*":
        return s.index("*/", m) + 2
    return m


def toplevel_tokens_pos(body):
    """Yield (UPPER_token, start, end) word tokens of `body` that sit at
    paren depth 0, outside literals/comments."""
    depth, m, out = 0, 0, []
    while m < len(body):
        m2 = skip_inert(body, m)
        if m2 != m:
            m = m2
            continue
        c = body[m]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and (c.isalpha() or c == "_"):
            j = m
            while j < len(body) and (body[j].isalnum() or body[j] == "_"):
                j += 1
            out.append((body[m:j].upper(), m, j))
            m = j
            continue
        m += 1
    return out


def toplevel_tokens(body):
    return [t for t, _, _ in toplevel_tokens_pos(body)]


def split_top_commas(txt):
    """Split `txt` on commas at paren depth 0, outside literals/comments."""
    parts, depth, start, m = [], 0, 0, 0
    while m < len(txt):
        m2 = skip_inert(txt, m)
        if m2 != m:
            m = m2
            continue
        c = txt[m]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(txt[start:m])
            start = m + 1
        m += 1
    parts.append(txt[start:])
    return parts


def split_ctes(sql):
    """Parse `WITH [RECURSIVE] a [(cols)] AS (...), ... <final select>`
    into (recursive_flag, [(name, cols_or_None, body), ...],
    final_select) with a balanced-paren scanner (bodies contain nested
    parens and commas). The caller asserts round-trip reassembly, so a
    mis-split cannot silently stage a truncated body."""
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
            m2 = skip_inert(s, m)
            if m2 != m:
                m = m2
                continue
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
            final = s[i:]
            # Round-trip safety net: reassembling the parse must give
            # back the original SQL modulo whitespace, or the scanner
            # mis-split (e.g. on a construct it doesn't know).
            rebuilt = (("WITH RECURSIVE " if recursive else "WITH ")
                       + ", ".join(f"{n}{' ' + c if c else ''} {kw} ({b})"
                                   for n, c, kw, b in ctes)
                       + " " + final)
            # Whitespace-insensitive compare, including around punctuation
            # (ADVICE r16): an oracle written `name(cols) AS` rebuilds as
            # `name (cols) AS`, which a bare split() norm does not collapse
            # — spuriously refusing a legitimate staging. Spaces adjacent
            # to ( ) , differ only in layout in SQL, so stripping them
            # keeps the equality check sound — but ONLY outside string
            # literals / quoted identifiers / comments (ADVICE r17: a
            # blanket regex would also collapse spacing INSIDE a literal
            # like 'a (b)', so a parse corruption that altered a literal's
            # spacing would slip past the safety net). Inert spans compare
            # VERBATIM; only the SQL-structural text between them is
            # normalized.
            import re as _re

            def norm(t):
                out, m = [], 0
                while m < len(t):
                    m2 = skip_inert(t, m)
                    if m2 != m:          # literal/ident/comment: verbatim
                        out.append(t[m:m2])
                        m = m2
                        continue
                    j = m                # non-inert run
                    while j < len(t) and skip_inert(t, j) == j:
                        j += 1
                    # Collapse whitespace runs to one space (instead of
                    # split/join, which DROPS boundary whitespace: the
                    # old norm made `AND 'x'` equal `AND'x'` — ADVICE
                    # r19); a space adjacent to an inert span is
                    # token-separating and must survive as one space.
                    # Only the ends of the whole statement are stripped.
                    run = _re.sub(r"\s*([(),])\s*", r"\1",
                                  _re.sub(r"\s+", " ", t[m:j]))
                    if m == 0:
                        run = run.lstrip()
                    if j == len(t):
                        run = run.rstrip()
                    out.append(run)
                    m = j
                return "".join(out)

            assert norm(rebuilt) == norm(s), \
                "split_ctes round-trip mismatch — refusing to stage"
            return recursive, ctes, final


def assert_chunkable(body, chunk_col):
    """Soundness preconditions for appending `WHERE <col> % N = c` to a
    CTE body (ADVICE r15): (1) no top-level set operator — the appended
    filter would silently bind only to the LAST arm, duplicating the
    other arms once per chunk; (2) no top-level WHERE/GROUP BY/QUALIFY/
    ORDER BY/HAVING/LIMIT/WINDOW — the append must become the query's
    sole WHERE clause over the whole body; (3) a top-level SELECT
    DISTINCT must select the chunk column — otherwise identical output
    rows arising in different chunks survive once PER CHUNK instead of
    once overall (ADVICE r16); (4) every window function in the body
    must PARTITION BY the chunk column as a BARE column reference —
    filtering whole partitions before a per-partition window is
    identity; an expression merely containing the column (e.g.
    `chunk_col % 2`) is not partition-preserving under the appended
    filter (ADVICE r16). NULL chunk-column rows are handled by the
    caller's NULL-safe predicate (they all land in chunk 0), not here."""
    toks_pos = toplevel_tokens_pos(body)
    toks = [t for t, _, _ in toks_pos]
    banned = {"UNION", "EXCEPT", "INTERSECT", "WHERE", "GROUP",
              "QUALIFY", "ORDER", "HAVING", "LIMIT", "WINDOW"}
    hit = sorted(set(toks) & banned)
    assert not hit, (
        f"cannot chunk this CTE: top-level {hit} would make the appended "
        f"WHERE unsound/invalid — stage it un-chunked or rewrite the oracle")
    import re
    if "DISTINCT" in toks:
        # Select list = text between the top-level DISTINCT and the first
        # top-level FROM (aggregate/substring DISTINCT/FROM sit inside
        # parens, so they never reach depth 0).
        di = next(e for t, _, e in toks_pos if t == "DISTINCT")
        fi = next((s for t, s, _ in toks_pos if t == "FROM"), len(body))
        sel_items = [x.strip() for x in split_top_commas(body[di:fi])]
        ok = any(x == "*" or x == chunk_col or
                 re.fullmatch(rf"[A-Za-z_][A-Za-z0-9_]*\.{re.escape(chunk_col)}", x)
                 for x in sel_items)
        assert ok, (
            f"cannot chunk on {chunk_col!r}: top-level SELECT DISTINCT does "
            f"not select it as a bare column — identical rows from different "
            f"chunks would each survive, duplicating output across chunks")
    # Every OVER (...) must partition by chunk_col as a bare column.
    for m in re.finditer(r"\bOVER\s*\(", body, re.I):
        depth, j = 0, m.end() - 1
        while True:
            j2 = skip_inert(body, j)
            if j2 != j:
                j = j2
                continue
            if body[j] == "(":
                depth += 1
            elif body[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        grp = body[m.end():j]
        pb = re.search(
            r"PARTITION\s+BY\s+(.*?)(?:\bORDER\s+BY\b|\bROWS\b|\bRANGE\b|\bGROUPS\b|$)",
            grp, re.I | re.S)
        pb_ok = pb is not None and any(
            e.strip() == chunk_col or
            re.fullmatch(rf"[A-Za-z_][A-Za-z0-9_]*\.{re.escape(chunk_col)}",
                         e.strip())
            for e in split_top_commas(pb.group(1)))
        assert pb_ok, (
            f"cannot chunk on {chunk_col!r}: window OVER ({grp.strip()[:80]}...) "
            f"does not PARTITION BY it as a bare column — chunking would "
            f"change its semantics")


def main():
    args = [a for a in sys.argv[1:]]
    json_out = None
    chunk_col, chunks = None, 1
    db_file, reuse = None, False
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
    if "--db" in args:
        i = args.index("--db")
        db_file = args[i + 1]
        del args[i:i + 2]
    if "--reuse" in args:
        reuse = True
        args.remove("--reuse")
    # --chunks without --chunk-col (or vice versa) must not silently
    # fall through to the un-chunked OOM path.
    assert (chunk_col is None) == (chunks == 1), \
        "--chunk-col and --chunks must be given together"
    assert not (reuse and db_file is None), "--reuse requires --db"
    out_dir, sf_dir, name, stage_cte = args

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    recursive, ctes, final = split_ctes(oracle)
    names = [n for n, _, _, _ in ctes]
    assert stage_cte in names, f"{stage_cte!r} not among CTEs {names}"
    cut = names.index(stage_cte)
    prefix = "WITH RECURSIVE " if recursive else "WITH "

    # --db persists staged tables to a DuckDB file so a FAMILY of
    # oracles sharing a byte-identical CTE prefix (e.g. the 7 graph_*
    # queries over the same corpus->shingle->pairs chain) pays the
    # expensive materialization ONCE; --reuse skips tables already
    # present. Soundness: _staged_meta records the md5 of each staged
    # body AND the resolved sf_dir it was built from; reuse asserts both
    # match — a same-named CTE with different text, or a --db built from
    # a different scale factor/data dir (ADVICE r16: staged tables from
    # one dataset mixed with live views over another give a wrong
    # oracle), fails loudly instead of silently reusing.
    import hashlib, os
    sf_real = os.path.realpath(sf_dir)
    con = duckdb.connect(db_file) if db_file else duckdb.connect()
    con.execute("SET temp_directory='.tmp'")
    kind = "TABLE" if db_file else "TEMP TABLE"
    if db_file:
        con.execute("CREATE TABLE IF NOT EXISTS _staged_meta "
                    "(name VARCHAR PRIMARY KEY, body_md5 VARCHAR, "
                    "sf_dir VARCHAR)")
        # Migrate a pre-r17 two-column meta table: sf_dir unknown → NULL,
        # which the reuse assert below rejects (fail-closed).
        have = [r[0] for r in con.execute(
            "SELECT column_name FROM information_schema.columns "
            "WHERE table_name = '_staged_meta'").fetchall()]
        if "sf_dir" not in have:
            con.execute("ALTER TABLE _staged_meta ADD COLUMN sf_dir VARCHAR")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    def staged_already(n, body):
        if not reuse:
            return False
        row = con.execute(
            "SELECT body_md5, sf_dir FROM _staged_meta WHERE name = ?",
            [n]).fetchone()
        if row is None:
            return False
        h = hashlib.md5(body.encode()).hexdigest()
        assert row[0] == h, (
            f"--reuse: staged table {n!r} was built from a DIFFERENT body "
            f"(md5 {row[0]} vs {h}) — use a fresh --db")
        assert row[1] == sf_real, (
            f"--reuse: staged table {n!r} was built from a DIFFERENT data "
            f"dir ({row[1]!r} vs {sf_real!r}) — use a fresh --db")
        return True

    def record(n, body):
        if db_file:
            con.execute("INSERT OR REPLACE INTO _staged_meta VALUES (?, ?, ?)",
                        [n, hashlib.md5(body.encode()).hexdigest(), sf_real])

    # Materialize every CTE up to the staged one, in order; staged tables
    # shadow nothing (no base table shares a CTE name) and later bodies
    # resolve earlier names to the staged tables. Each CTE is re-wrapped
    # as a single-CTE WITH of the SAME name so column-list renames and
    # recursive self-references keep their original resolution; the body
    # text is unchanged.
    for n, cols, kw, body in ctes[: cut + 1]:
        if staged_already(n, body):
            print(f"    reused {n}", flush=True)
            continue
        if n == stage_cte and chunk_col and chunks > 1:
            assert cols is None, "chunking a column-list CTE is unsupported"
            assert_chunkable(body, chunk_col)
            # LIMIT 0 schema probe: streamable without materializing the
            # body's window/cross-join input, unlike a constant-false
            # WHERE that only helps if the optimizer collapses it.
            con.execute(
                f"CREATE {kind} {n} AS SELECT * FROM ({body}\n) q LIMIT 0")
            for c in range(chunks):
                # NULL-safe, sign-safe chunk assignment (ADVICE r16+r17):
                # `col % N = c` is never true for NULL (dropped from every
                # chunk) and SQL's % keeps the sign of a negative key
                # (also dropped). The ((col % N) + N) % N form maps
                # negatives into [0, N) without abs() — which both
                # overflows DuckDB's BIGINT on the minimum value (aborting
                # the staging mid-INSERT) and folds -k and +k into the
                # same chunk, skewing chunk sizes for sign-symmetric keys.
                # This plus the NULL→chunk-0 arm keeps the chunks a
                # disjoint, COMPLETE partition of the body.
                con.execute(
                    f"INSERT INTO {n} {body}\n"
                    f"WHERE ((({chunk_col} % {chunks}) + {chunks})"
                    f" % {chunks} = {c})"
                    f" OR ({chunk_col} IS NULL AND {c} = 0)")
                print(f"    staged chunk {c + 1}/{chunks} of {n}", flush=True)
        else:
            con.execute(
                f"CREATE {kind} {n} AS {prefix}{n} {cols or ''} {kw} ({body}) "
                f"SELECT * FROM {n}")
            print(f"    staged {n}", flush=True)
        record(n, body)
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
