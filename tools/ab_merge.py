#!/usr/bin/env python3
"""Merge the interleaved A/B invocation artifacts (tools/ab_probe.sh) into
one verdict file. Per query and side: min over every sample of every
invocation (each invocation already records per-query n/min/med/max in its
stats field). The verdict is plan-attributable iff HEAD/r14 per-query min
ratios exceed ~1.1x consistently; one-off spikes are climate."""
import json, sys, glob

prefix = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab"
out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_AB_R14R15.json"

sides = {}
for side in ("A", "B"):
    files = sorted(glob.glob(f"{prefix}_{side}_*.json"))
    if not files:
        sys.exit(f"no artifacts for side {side} ({prefix}_{side}_*.json)")
    per_q = {}
    for f in files:
        d = json.loads(open(f).read())
        for q, st in d["stats"].items():
            e = per_q.setdefault(q, {"n": 0, "min": float("inf"), "max": 0.0})
            e["n"] += st["n"]
            e["min"] = min(e["min"], st["min"])
            e["max"] = max(e["max"], st["max"])
    sides[side] = {"files": files, "queries": per_q}

qa, qb = sides["A"]["queries"], sides["B"]["queries"]
shared = sorted(set(qa) & set(qb))
# ADVICE r16: a zero side-A min is a degenerate sample (a timer can't read
# 0.0s on a real query) — exclude it from the comparison and SAY so in the
# artifact instead of crashing on round(None, 3)/max(None) below
degenerate = [q for q in shared if qa[q]["min"] <= 0 or qb[q]["min"] <= 0]
shared = [q for q in shared if q not in degenerate]
rows = {}
for q in shared:
    ratio = qb[q]["min"] / qa[q]["min"]
    rows[q] = {
        "r14_min": round(qa[q]["min"], 3), "head_min": round(qb[q]["min"], 3),
        "ratio": round(ratio, 3), "n_r14": qa[q]["n"], "n_head": qb[q]["n"],
        "r14_max": round(qa[q]["max"], 3), "head_max": round(qb[q]["max"], 3),
    }
if not rows:
    sys.exit("ab_merge: no comparable queries (all shared samples degenerate)")
tot_a = sum(qa[q]["min"] for q in shared)
tot_b = sum(qb[q]["min"] for q in shared)
worst = max(rows.values(), key=lambda r: r["ratio"])["ratio"]
doc = {
    "metric": "ab_r14_vs_head",
    "protocol": "3 alternating rounds of (r14 80b976b, HEAD), each a full "
                "Bench run (sf0.001 warmup + 3 timed passes) at sf0.1 "
                "local[32]; per-query min over all 9 samples per side",
    "r14_total_sec": round(tot_a, 3), "head_total_sec": round(tot_b, 3),
    "total_ratio": round(tot_b / tot_a, 3), "worst_query_ratio": worst,
    "plan_attributable": bool(tot_b / tot_a > 1.1),
    "queries_excluded_degenerate": degenerate,
    "queries": rows,
}
with open(out, "w") as f:
    json.dump(doc, f, indent=1)
print(json.dumps({k: doc[k] for k in
                  ("r14_total_sec", "head_total_sec", "total_ratio",
                   "worst_query_ratio", "plan_attributable")}))
