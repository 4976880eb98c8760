#!/bin/bash
# Full-suite decade-up correctness sweep at sf1 (VERDICT r16 task 2).
#
# The sf0.01 gate is blind to whole failure classes the next decade exposes
# — oracle-side INT64 overflow (caught r9 AND r16 by exactly this sweep),
# banded-LSH recall holes (no true pairs below j~0.8 at sf0.01), silently
# oversized broadcasts. This script institutionalizes the lesson: run every
# registered query's dump + DuckDB oracle at sf1 and commit the per-query
# result as CORRECTNESS_SF1.json with an explicit, justified exclusion list.
#
# Exclusions (oracle-side only — Spark dumps ALL queries):
#   d06_dedup_clusters,  DuckDB's one-statement recursive-CTE closure is
#   s04_cluster_centroids  O(component^2) in the reach table and does not
#                       terminate on sf1's giant cos>=0.35 component
#                       (observed r17: >25 min in s04's reach before kill).
#                       The sf1 proof for BOTH lives in
#                       tools/sf1_closure_check.py (iterative label
#                       propagation + pointer jumping, validated against
#                       the CTE at sf0.01): run it alongside this sweep and
#                       quote its result in the artifact note.
# Everything else — including d05's declared-quadratic cartesian baseline
# (20k vectors -> 2e8 ordered pairs; norm-hoisted, measured 33 s r17) and
# d12/q66 whose RECURSIVE CTEs are depth-bounded, not closures — runs.
#
# Exit codes: Verify may exit 2 at sf1 (age_sum crosses the 10% alarm line
# around sf3.5 by the measured quadratic; the gate exists to say so) —
# check_verify.py is told the code and compares normally per its contract.
set -u
cd /root/repo
SF=${1:-/root/repo/testdata/sf1}
OUT=${2:-/tmp/verify_sf1}
ART=${3:-CORRECTNESS_SF1.json}
SKIP_ORACLE="d06_dedup_clusters,s04_cluster_centroids"

rm -rf "$OUT"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
  sbt -batch "runMain graft.Verify $SF $OUT"
rc=$?
if [ $rc -eq 1 ]; then
  echo "sf1_sweep: Verify exited 1 (dumps incomplete) — not comparing" >&2
  exit 1
fi

python3 tools/check_verify.py "$SF" "$OUT" verify_exit=$rc \
  skip="$SKIP_ORACLE" json_out="$ART" \
  note="full-suite decade-up sweep (VERDICT r16 task 2); verify_exit=$rc; oracle exclusions: d06_dedup_clusters (DuckDB recursive-CTE closure is O(component^2) at sf1 — alternate proof: tools/sf1_closure_check.py, r9)"
