#!/bin/bash
# q12 64-bit wrap demo at ~sf200 (VERDICT r14 item 2): the r14 grouped
# overflow audit predicts q12's per-(returnflag × linestatus) charge sums —
# ~57% of 2^63 per group at sf100 — cross the 64-bit ceiling near sf175.
# This probe generates an sf200 set (~32 GB) and runs the three-way
# comparison that turns the prediction into a measured end-to-end fact:
#   1. q12 NARROW (64-bit sums)          -> expected HASH-FAIL vs DuckDB
#   2. q12 WIDE  (GRAFT_WIDE_SUMS=1)     -> expected PASS vs DuckDB
#   3. DuckDB HUGEINT oracle             -> the ground truth both compare to
# plus the audit's own sf200 revenue_sum fraction (expected >100%).
# Results merge into BENCH_SF200.json.
#
# Lessons wired in: /dev/shm spark-local dirs are HOST MEMORY (clean before
# every stage); sbt flattens JVM exit codes to 1, so the real Verify exit
# (2 = gate tripped by design here) is parsed from the runner line; never
# run a second sbt while a stage benches.
set -u
cd /root/repo
SF_DIR=${1:-/root/repo/testdata/sf200}

if [ ! -d "$SF_DIR" ]; then
  echo "[sf200] generating $SF_DIR (factor 2000, ~32 GB, ~15 min)"
  python3 tools/gen_scale.py /root/testdata/sf0.1 "$SF_DIR" 2000 || exit 1
fi

runner_exit() { # parse the forked JVM's exit code out of an sbt log
  grep -oE 'Nonzero exit code returned from runner: [0-9]+' "$1" \
    | tail -1 | grep -oE '[0-9]+$' || echo 0
}

rm -rf /dev/shm/spark-local* /tmp/v_sf200_narrow /tmp/v_sf200_wide
echo "[sf200] narrow q12 dump + audit"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt -batch "runMain graft.Verify $SF_DIR /tmp/v_sf200_narrow q12_pricing_summary" \
  > /tmp/v_sf200_narrow.log 2>&1
NARROW_EXIT=$(runner_exit /tmp/v_sf200_narrow.log)
grep -E 'overflow-audit' /tmp/v_sf200_narrow.log | sed 's/^/[sf200-audit] /'
echo "[sf200] narrow verify exit: $NARROW_EXIT (2 = gate tripped, expected)"

rm -rf /dev/shm/spark-local*
echo "[sf200] wide q12 dump (GRAFT_WIDE_SUMS=1)"
GRAFT_WIDE_SUMS=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt -batch "runMain graft.Verify $SF_DIR /tmp/v_sf200_wide q12_pricing_summary" \
  > /tmp/v_sf200_wide.log 2>&1
WIDE_EXIT=$(runner_exit /tmp/v_sf200_wide.log)
echo "[sf200] wide verify exit: $WIDE_EXIT (0 expected: switch releases the covered rows)"

echo "[sf200] DuckDB HUGEINT compare (narrow expected to FAIL, wide to PASS)"
python3 tools/check_verify.py "$SF_DIR" /tmp/v_sf200_narrow \
  only=q12_pricing_summary verify_exit=2 json_out=/tmp/sf200_narrow.json \
  note="q12 narrow at sf200: 64-bit charge sums past the ceiling" \
  | tail -3
python3 tools/check_verify.py "$SF_DIR" /tmp/v_sf200_wide \
  only=q12_pricing_summary json_out=/tmp/sf200_wide.json \
  note="q12 wide (GRAFT_WIDE_SUMS=1) at sf200" \
  | tail -3

python3 - "$NARROW_EXIT" "$WIDE_EXIT" <<'EOF'
import json, re, sys
narrow_exit, wide_exit = sys.argv[1], sys.argv[2]
narrow = json.load(open('/tmp/sf200_narrow.json'))
wide = json.load(open('/tmp/sf200_wide.json'))
audit = [l.strip() for l in open('/tmp/v_sf200_narrow.log', errors='replace')
         if 'overflow-audit' in l]
rev = next((l for l in audit if 'revenue_sum:' not in l and 'revenue_sum' in l), '')
m = re.search(r'\(([\d.]+)% of 2\^63\)', rev)
out = {
    'metric': 'q12_wrap_demo_sf200',
    'sf_dir': narrow['sf'],
    'predicted': 'q12 per-group charge sums wrap near sf175 (r14 audit: ~57%/group at sf100)',
    'narrow_verify_exit': int(narrow_exit),
    'wide_verify_exit': int(wide_exit),
    'narrow_q12': narrow['results'].get('q12_pricing_summary'),
    'wide_q12': wide['results'].get('q12_pricing_summary'),
    'audit_revenue_sum_row': rev,
    'audit_global_fraction_pct': float(m.group(1)) if m else None,
}
ok = (out['narrow_q12'] or {}).get('status') == 'value_mismatch' and \
     (out['wide_q12'] or {}).get('status') == 'ok'
out['demo_confirms_prediction'] = ok
print(json.dumps(out, indent=1))
with open('/root/repo/BENCH_SF200.json', 'w') as f:
    json.dump(out, f, indent=1)
print('wrote /root/repo/BENCH_SF200.json; demo_confirms_prediction =', ok)
EOF
