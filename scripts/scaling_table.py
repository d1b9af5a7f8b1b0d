#!/usr/bin/env python3
"""Render the scaling growth table from bench_scaling.sh raw output.

Input lines look like:
  sf=0.01 {"metric":"queries_by_name","queries":{...},"failures":{}}
Only the full-name min line ("queries_by_name") per SF is used.
Each SF step is a 10x row-count increase; the table prints per-query
min seconds at each SF and the step ratios. A ratio well under 10
means fixed overhead (session/scan setup, shuffle latency) still
dominates at the smaller SF; a ratio well OVER 10 is a super-linear
outlier to adjudicate against the operator's documented governor.
"""
import json
import sys

rows = {}  # sf -> {query: sec}
for line in open(sys.argv[1]):
    sf, payload = line.split(None, 1)
    sf = sf.removeprefix("sf=")
    obj = json.loads(payload)
    if obj.get("metric") == "queries_by_name":
        rows[sf] = obj["queries"]

sfs = sorted(rows, key=float)
queries = sorted(rows[sfs[-1]], key=lambda q: -rows[sfs[-1]][q])
w = max(len(q) for q in queries)
hdr = f"{'query':<{w}} " + " ".join(f"{'sf' + sf:>9}" for sf in sfs)
hdr += "".join(f" {'x' + sfs[i] + '/' + sfs[i - 1]:>12}" for i in range(1, len(sfs)))
print(hdr)
print("-" * len(hdr))
for q in queries:
    vals = [rows[sf].get(q) for sf in sfs]
    cells = [f"{v:9.3f}" if v is not None else f"{'-':>9}" for v in vals]
    for i in range(1, len(sfs)):
        a, b = vals[i - 1], vals[i]
        cells.append(f"{b / a:12.2f}" if a and b else f"{'-':>12}")
    print(f"{q:<{w}} " + " ".join(cells))
tot = [sum(rows[sf].values()) for sf in sfs]
cells = [f"{v:9.3f}" for v in tot]
for i in range(1, len(sfs)):
    cells.append(f"{tot[i] / tot[i - 1]:12.2f}")
print("-" * len(hdr))
print(f"{'TOTAL':<{w}} " + " ".join(cells))
