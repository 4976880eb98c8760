#!/usr/bin/env python3
"""Build a scale-ratio bench artifact: a bigger-SF run joined against a
smaller-SF run of the same code, as per-query and per-family wall-clock
scaling ratios.

The scale check VERDICT r8 asked for: correctness is proven at sf1
(121/121 hash-exact) but wall-time was only ever measured at sf0.1 — a
superlinear plan passes every existing gate. Data volume scales `factor`x
per decade, so a scan-bound family should scale <= ~1.2*factor (factor x
rows + constant overheads); anything > 2*factor gets a plan diagnosis.

Usage: sf1_report.py <big_raw.json> <small_raw.json> <out.json>
                     [big_label small_label factor [notes.json]]
Defaults reproduce the round-9 sf1-vs-sf0.1 artifact (factor 10).
notes.json (if given) is merged into the output verbatim — the place for
per-run flag diagnoses (e.g. measured output-volume growth behind a >flag
ratio) so the artifact carries its own reading.
"""
import json
import sys
from collections import defaultdict

big_path, small_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
big_label = sys.argv[4] if len(sys.argv) > 4 else "sf1"
small_label = sys.argv[5] if len(sys.argv) > 5 else "sf0.1"
factor = int(sys.argv[6]) if len(sys.argv) > 6 else 10
flag_at = 2 * factor

big = json.load(open(big_path))
small = json.load(open(small_path))

qb, qs = big["queries"], small["queries"]
shared = sorted(set(qb) & set(qs))
kb, ks = f"{big_label}_sec", f"{small_label}_sec"

FAMILY = {
    "q": "etl+analytics", "d": "dedup", "s": "similarity",
    "m": "multimodal", "t": "text",
}

per_query = {}
fam_sums = defaultdict(lambda: [0.0, 0.0])
for name in shared:
    a, b = qs[name], qb[name]
    ratio = round(b / a, 2) if a > 0 else None
    per_query[name] = {ks: a, kb: b, "ratio": ratio}
    fam = FAMILY.get(name[0], "other")
    fam_sums[fam][0] += a
    fam_sums[fam][1] += b

families = {
    fam: {
        f"{small_label}_total_sec": round(a, 3),
        f"{big_label}_total_sec": round(b, 3),
        "ratio": round(b / a, 2),
    }
    for fam, (a, b) in sorted(fam_sums.items())
}

flagged = sorted(
    (n for n, v in per_query.items() if v["ratio"] and v["ratio"] > flag_at),
    key=lambda n: -per_query[n]["ratio"],
)

def run_config(raw):
    """The run's actual knobs, from the raw itself (ADVICE r11: a hardcoded
    config string here once misdescribed a cross-config comparison). Bench
    r12+ emits a structured `config`; merged raws carry per-group configs in
    the protocol dict; pre-r12 raws only have the protocol string."""
    if raw.get("config") is not None:
        return raw["config"]
    p = raw.get("protocol")
    if isinstance(p, dict):
        return {g: {"config": v.get("config"), "protocol": v.get("protocol")}
                for g, v in p.items()}
    return p


big_cfg, small_cfg = run_config(big), run_config(small)

# Only the EXECUTION keys decide whether ratios measure plan scaling;
# passes/outlier_sec are sampling protocol (they change dispersion, not
# per-query wall) and differing there is the designed per-scale dial.
EXEC_KEYS = ("master", "shuffle_partitions", "max_partition_bytes")


def exec_view(cfg):
    if isinstance(cfg, dict) and "master" in cfg:
        return {k: cfg.get(k) for k in EXEC_KEYS}
    if isinstance(cfg, dict):  # merged raw: per-group configs
        views = [exec_view(v.get("config")) for v in cfg.values()
                 if isinstance(v, dict)]
        return views[0] if views and all(v == views[0] for v in views) else None
    return None  # pre-r12 string — unknowable


bv, sv = exec_view(big_cfg), exec_view(small_cfg)
config = {big_label: big_cfg, small_label: small_cfg,
          "note": ("execution config consistent on both scales "
                   f"({bv}), so ratios measure plan scaling; sampling "
                   "protocol (passes/outlier) is the per-scale dial "
                   "recorded above"
                   if bv is not None and bv == sv else
                   f"execution configs DIFFER between scales ({small_label}="
                   f"{sv}, {big_label}={bv}) — ratios are cross-config; read "
                   "the per-scale configs above before attributing a ratio "
                   "to the plan")}

out = {
    "what": f"{big_label} ({factor}x {small_label}) headline bench vs a "
            f"same-code {small_label} run; ratio = {big_label}/{small_label} "
            "per-query-min seconds",
    "config": config,
    "interpretation": f"data volume scales {factor}x; scan-bound plans "
                      f"should land <= ~{round(1.2 * factor)}x ({factor}x "
                      f"rows + constant overheads); > {flag_at}x flags a "
                      "superlinear plan for diagnosis. The recall-1.0 "
                      "embedding dedup family (d06/d07, and cell-local d11) "
                      "is quadratic-by-contract in candidate pairs at its "
                      "cos>=0.35 operating point (SURVEY par-8 cost floor) — "
                      "expected to lead the table when present, watched "
                      f"against the {flag_at}x line rather than the "
                      "scan-bound line",
    f"protocol_{big_label}": big.get("protocol"),
    f"protocol_{small_label}": small.get("protocol"),
    f"{big_label}_total_sec": round(sum(qb[n] for n in shared), 3),
    f"{small_label}_total_sec": round(sum(qs[n] for n in shared), 3),
    "total_ratio": round(sum(qb[n] for n in shared) / sum(qs[n] for n in shared), 2),
    "families": families,
    f"flagged_over_{flag_at}x": flagged,
    "queries": per_query,
    f"stats_{big_label}": big.get("stats"),
}
if len(sys.argv) > 7:
    out.update(json.load(open(sys.argv[7])))
json.dump(out, open(out_path, "w"), indent=1)
print(f"wrote {out_path}: total ratio {out['total_ratio']}x, "
      f"{len(flagged)} queries over {flag_at}x: {flagged[:10]}")
for fam, v in families.items():
    print(f"  {fam}: {v[f'{small_label}_total_sec']}s -> "
          f"{v[f'{big_label}_total_sec']}s ({v['ratio']}x)")
