#!/usr/bin/env python3
"""Merge two graft.Bench raw JSON lines into one raw file.

The decade-3 (sf100) probe splits its protocol: the scan-bound subset runs
2 interleaved passes, while the quadratic-by-contract cell-local pair
(d11/d13 at pinned k=16, ~10-20 min per sample at sf100) runs 1 pass —
re-sampling a query whose cost is its documented contract would buy no
information for ~40 min of wall. Both invocations are the same binary on
the same night; this tool unions their query/stat maps and records both
protocol strings so the artifact self-describes which group got which.

Usage: merge_raw.py <a_raw.json> <b_raw.json> <out.json>
"""
import json
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))

overlap = set(a["queries"]) & set(b["queries"])
if overlap:
    sys.exit(f"refusing to merge: duplicate queries {sorted(overlap)}")

out = dict(a)
out["queries"] = {**a["queries"], **b["queries"]}
out["stats"] = {**a.get("stats", {}), **b.get("stats", {})}
out["value"] = round(sum(out["queries"].values()), 3)
out["protocol"] = {
    "group_a": {"queries": sorted(a["queries"]), "protocol": a.get("protocol")},
    "group_b": {"queries": sorted(b["queries"]), "protocol": b.get("protocol")},
}

with open(sys.argv[2 + 1], "w") as f:
    json.dump(out, f)
print(f"merged {len(a['queries'])}+{len(b['queries'])} queries -> {sys.argv[3]}")
