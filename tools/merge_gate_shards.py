#!/usr/bin/env python3
"""Merge sharded local_verify outputs into the one gate artifact.

The sf1 gate runs as disjoint partitions of the SAME Verify dump (see
local_verify's only=/skip= flags) so the multi-hour DuckDB oracles
(q73/q76 levenshtein, q122 triangles) overlap instead of serializing.
This concatenates the shard logs, keeps the LAST result per query
(a re-gated query supersedes an earlier failed attempt), sorts by
query name, and emits one summary line — the same shape a single
sequential run prints.

Usage: merge_gate_shards.py out.txt header... -- shard1.log shard2.log ...
"""
import re
import sys

args = sys.argv[1:]
sep = args.index("--")
out_path, header = args[0], " ".join(args[1:sep])
results = {}
conflicts = []
for log in args[sep + 1:]:
    for line in open(log):
        m = re.match(r"(PASS|ROWS|FAIL)\s+(\S+):\s*(.*)", line)
        if m:
            name, status = m.group(2), m.group(1)
            # shards must be disjoint: a repeated name with a DIFFERENT
            # status means overlapping shards or a stale log, and
            # last-writer-wins could silently mask a FAIL — refuse.
            if name in results and results[name][0] != status:
                conflicts.append(
                    f"{name}: {results[name][0]} (earlier log) vs "
                    f"{status} ({log})")
            results[name] = (status, m.group(3))
if conflicts:
    sys.stderr.write(
        "CONFLICTING statuses across shard logs (overlap or stale log?):\n"
        + "\n".join("  " + c for c in conflicts) + "\n")
    sys.exit(1)
n_pass = sum(1 for s, _ in results.values() if s == "PASS")
n_rows = sum(1 for s, _ in results.values() if s == "ROWS")
n_fail = sum(1 for s, _ in results.values() if s == "FAIL")
with open(out_path, "w") as f:
    f.write(header + "\n\n")
    for name in sorted(results):
        s, rest = results[name]
        f.write(f"{s}{'' if s == 'ROWS' else ' '} {name}: {rest}\n")
    f.write(f"\n{n_pass} pass, {n_rows} rows-only, {n_fail} fail\n")
print(f"{n_pass} pass, {n_rows} rows-only, {n_fail} fail -> {out_path}")
