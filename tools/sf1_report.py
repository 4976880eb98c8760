#!/usr/bin/env python3
"""Build BENCH_SF1.json: the sf1 bench run plus per-query and per-family
sf0.1 -> sf1 scaling ratios against a same-code sf0.1 run.

The scale check VERDICT r8 asked for: correctness is proven at sf1
(121/121 hash-exact) but wall-time was only ever measured at sf0.1 — a
superlinear plan passes every existing gate. Data volume scales 10x, so a
scan-bound family should scale <= ~12x (10x rows + constant overheads);
anything > 20x gets a plan diagnosis before it ships.

Usage: sf1_report.py <sf1_raw.json> <sf01_raw.json> <out.json>
"""
import json
import sys
from collections import defaultdict

sf1_path, sf01_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
sf1 = json.load(open(sf1_path))
sf01 = json.load(open(sf01_path))

q1, q01 = sf1["queries"], sf01["queries"]
shared = sorted(set(q1) & set(q01))

FAMILY = {
    "q": "etl+analytics", "d": "dedup", "s": "similarity",
    "m": "multimodal", "t": "text",
}

per_query = {}
fam_sums = defaultdict(lambda: [0.0, 0.0])
for name in shared:
    a, b = q01[name], q1[name]
    ratio = round(b / a, 2) if a > 0 else None
    per_query[name] = {"sf0.1_sec": a, "sf1_sec": b, "ratio": ratio}
    fam = FAMILY.get(name[0], "other")
    fam_sums[fam][0] += a
    fam_sums[fam][1] += b

families = {
    fam: {
        "sf0.1_total_sec": round(a, 3),
        "sf1_total_sec": round(b, 3),
        "ratio": round(b / a, 2),
    }
    for fam, (a, b) in sorted(fam_sums.items())
}

flagged = sorted(
    (n for n, v in per_query.items() if v["ratio"] and v["ratio"] > 20),
    key=lambda n: -per_query[n]["ratio"],
)

out = {
    "what": "sf1 (10x sf0.1, 32 row-groups/table) headline bench vs a "
            "same-code sf0.1 run; ratio = sf1/sf0.1 per-query-min seconds",
    "config": "local[32], shuffle.partitions=32, prep default "
              "maxPartitionBytes=128m on BOTH scales (layout-consistent: "
              "every file fits one split at both scales, so ratios measure "
              "plan scaling, not scan-parallelism differences)",
    "interpretation": "data volume scales 10x; scan-bound plans should land "
                      "<= ~12x (10x rows + constant overheads); > 20x flags "
                      "a superlinear plan for diagnosis. The recall-1.0 "
                      "embedding dedup family (d06/d07, and cell-local d11) "
                      "is quadratic-by-contract in candidate pairs at its "
                      "cos>=0.35 operating point (SURVEY par-8 cost floor) — "
                      "expected to lead the table, watched against the 20x "
                      "line rather than the scan-bound 12x line",
    "protocol_sf1": sf1.get("protocol"),
    "protocol_sf0.1": sf01.get("protocol"),
    "sf1_total_sec": round(sum(q1[n] for n in shared), 3),
    "sf0.1_total_sec": round(sum(q01[n] for n in shared), 3),
    "total_ratio": round(sum(q1[n] for n in shared) / sum(q01[n] for n in shared), 2),
    "families": families,
    "flagged_over_20x": flagged,
    "queries": per_query,
    "stats_sf1": sf1.get("stats"),
}
json.dump(out, open(out_path, "w"), indent=1)
print(f"wrote {out_path}: total ratio {out['total_ratio']}x, "
      f"{len(flagged)} queries over 20x: {flagged[:10]}")
for fam, v in families.items():
    print(f"  {fam}: {v['sf0.1_total_sec']}s -> {v['sf1_total_sec']}s ({v['ratio']}x)")
