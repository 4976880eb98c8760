#!/usr/bin/env python3
"""Merge two graft.Bench raw JSON lines into one raw file.

The decade-3 (sf100) probe splits its protocol: the scan-bound subset runs
2 interleaved passes, while the quadratic-by-contract cell-local pair
(d11/d13 at pinned k=16, ~10-20 min per sample at sf100) runs 1 pass —
re-sampling a query whose cost is its documented contract would buy no
information for ~40 min of wall. Both invocations are the same binary on
the same night; this tool unions their query/stat maps and records both
protocol strings so the artifact self-describes which group got which.

Guards (ADVICE r11): the two raws must agree on sf dir, metric and unit —
merging runs from different scales or binaries would fabricate a coherent-
looking artifact. The output carries `"merged": true` and a dict-shaped
`protocol`, so consumers expecting Bench's string protocol can detect it.

Usage: merge_raw.py <a_raw.json> <b_raw.json> <out.json>
"""
import json
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))

for key in ("sf", "metric", "unit"):
    if a.get(key) != b.get(key):
        sys.exit(f"refusing to merge: {key} differs "
                 f"({a.get(key)!r} vs {b.get(key)!r}) — raws must come from "
                 "the same scale dir and binary")

overlap = set(a["queries"]) & set(b["queries"])
if overlap:
    sys.exit(f"refusing to merge: duplicate queries {sorted(overlap)}")

out = dict(a)
out["merged"] = True
out["queries"] = {**a["queries"], **b["queries"]}
out["stats"] = {**a.get("stats", {}), **b.get("stats", {})}
out["value"] = round(sum(out["queries"].values()), 3)
out["protocol"] = {
    "group_a": {"queries": sorted(a["queries"]), "protocol": a.get("protocol"),
                "config": a.get("config")},
    "group_b": {"queries": sorted(b["queries"]), "protocol": b.get("protocol"),
                "config": b.get("config")},
}
# one shared config only when the groups genuinely agree; else per-group
# (the protocol dict above) is the source of truth
if a.get("config") == b.get("config"):
    out["config"] = a.get("config")
else:
    out.pop("config", None)

with open(sys.argv[3], "w") as f:
    json.dump(out, f)
print(f"merged {len(a['queries'])}+{len(b['queries'])} queries -> {sys.argv[3]}")
