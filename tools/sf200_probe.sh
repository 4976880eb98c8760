#!/bin/bash
# 64-bit wrap demo at ~sf200 (VERDICT r14 item 2, CORRECTED by its own
# first run, r15). The r14 audit narrative predicted q12's per-group charge
# sums wrap near sf175 — that figure came from the FAMILY-CEILING row
# (conservative by design: the unfiltered global charge sum, 680% of 2^63
# at sf200), not from q12's own 6-way grouping, which measures 61.3% of
# 2^63 per group at sf200 (ladder: 30.7% at sf100 — exactly linear — so
# q12's true first wrap is near sf330). What this probe's first run DID
# find at sf200:
#   1. the engine's earliest REAL 64-bit crossing is the age_sum interval
#      family (q27: worst per-type sum(max_ts - ts_us) = 573% of 2^63 at
#      sf200, past 100% near sf35) — previously UNAUDITED; r15 added the
#      audit row, swept q27 through the xsum engine switch, and this probe
#      demos narrow-FAILS / wide-PASSES on it end to end;
#   2. a cross-engine rounding tie: q12's A/O-group charge sum lands on
#      ...685000 exactly, and round(double, 2) breaks the tie differently
#      in Spark (shortest-decimal HALF_UP -> .69) vs DuckDB (binary value
#      -> .68). Fixed r15 by deciding the cent in exact integer arithmetic
#      on BOTH sides (SparkEntry.cents2 / `(sum + k/2) // k`), so q12
#      narrow now PASSES at sf200 (below its true wrap).
# Three-way comparison run here:
#   narrow (64-bit)          -> q12 PASS (below sf330), q27 HASH-FAIL (wrapped)
#   wide (GRAFT_WIDE_SUMS=1) -> both PASS (decimal(38,0) buffers)
#   DuckDB HUGEINT           -> ground truth
# Results merge into BENCH_SF200.json.
#
# Lessons wired in: /dev/shm spark-local dirs are HOST MEMORY (clean before
# every stage); sbt flattens JVM exit codes to 1, so the real Verify exit
# (2 = gate tripped by design here) is parsed from the runner line; never
# run a second sbt while a stage benches.
set -u
cd /root/repo
SF_DIR=${1:-/root/repo/testdata/sf200}
QS=q12_pricing_summary,q27_age_metrics

if [ ! -d "$SF_DIR" ]; then
  echo "[sf200] generating $SF_DIR (factor 2000, ~31 GB, ~15 min)"
  python3 tools/gen_scale.py /root/testdata/sf0.1 "$SF_DIR" 2000 || exit 1
fi

runner_exit() { # parse the forked JVM's exit code out of an sbt log
  grep -oE 'Nonzero exit code returned from runner: [0-9]+' "$1" \
    | tail -1 | grep -oE '[0-9]+$' || echo 0
}

rm -rf /dev/shm/spark-local* /tmp/v_sf200_narrow /tmp/v_sf200_wide
echo "[sf200] narrow q12+q27 dump + audit"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt -batch "runMain graft.Verify $SF_DIR /tmp/v_sf200_narrow $QS" \
  > /tmp/v_sf200_narrow.log 2>&1
NARROW_EXIT=$(runner_exit /tmp/v_sf200_narrow.log)
grep -E 'overflow-audit' /tmp/v_sf200_narrow.log | sed 's/^/[sf200-audit] /'
echo "[sf200] narrow verify exit: $NARROW_EXIT (2 = gate tripped, expected)"

rm -rf /dev/shm/spark-local*
echo "[sf200] wide q12+q27 dump (GRAFT_WIDE_SUMS=1)"
GRAFT_WIDE_SUMS=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt -batch "runMain graft.Verify $SF_DIR /tmp/v_sf200_wide $QS" \
  > /tmp/v_sf200_wide.log 2>&1
WIDE_EXIT=$(runner_exit /tmp/v_sf200_wide.log)
echo "[sf200] wide verify exit: $WIDE_EXIT (0 expected: switch releases the covered rows)"

echo "[sf200] DuckDB HUGEINT compare (narrow q27 expected to FAIL, all else PASS)"
python3 tools/check_verify.py "$SF_DIR" /tmp/v_sf200_narrow \
  only=$QS verify_exit=2 json_out=/tmp/sf200_narrow.json \
  note="narrow at sf200: q27's 64-bit age sums past the ceiling (573%), q12 below its (61%/group)" \
  | tail -5
python3 tools/check_verify.py "$SF_DIR" /tmp/v_sf200_wide \
  only=$QS json_out=/tmp/sf200_wide.json \
  note="wide (GRAFT_WIDE_SUMS=1) at sf200" \
  | tail -5

python3 - "$NARROW_EXIT" "$WIDE_EXIT" <<'EOF'
import json, re, sys
narrow_exit, wide_exit = sys.argv[1], sys.argv[2]
narrow = json.load(open('/tmp/sf200_narrow.json'))
wide = json.load(open('/tmp/sf200_wide.json'))
audit = [l.strip() for l in open('/tmp/v_sf200_narrow.log', errors='replace')
         if 'overflow-audit' in l]
def row(fam):
    return next((l.split('overflow-audit', 1)[1].strip() for l in audit
                 if re.search(r'\[(ok|ALARM)\] ' + re.escape(fam) + ':', l)), '')
def pct(line):
    m = re.search(r'\(([\d.]+)% of 2\^63\b', line)
    return float(m.group(1)) if m else None
out = {
    'metric': 'wrap_demo_sf200',
    'sf_dir': narrow['sf'],
    'finding': ('the engine\'s earliest 64-bit crossing is the age_sum interval family '
                '(q27), not the monetary families: span x rows makes it ~quadratic in SF. '
                'q12\'s own grouping is at 61%/group at sf200 (first wrap ~sf330); the '
                'r14 "~sf175" figure was the conservative family-ceiling row.'),
    'narrow_verify_exit': int(narrow_exit),
    'wide_verify_exit': int(wide_exit),
    'narrow_q12': narrow['results'].get('q12_pricing_summary'),
    'narrow_q27': narrow['results'].get('q27_age_metrics'),
    'wide_q12': wide['results'].get('q12_pricing_summary'),
    'wide_q27': wide['results'].get('q27_age_metrics'),
    'audit_revenue_sum_row': row('revenue_sum'),
    'audit_age_sum_row': row('age_sum'),
    'audit_revenue_ceiling_pct': pct(row('revenue_sum')),
    'audit_age_sum_pct': pct(row('age_sum')),
}
st = lambda d: (d or {}).get('status')
ok = (int(narrow_exit) == 2 and int(wide_exit) == 0 and
      st(out['narrow_q12']) == 'ok' and
      st(out['narrow_q27']) == 'value_mismatch' and
      st(out['wide_q12']) == 'ok' and st(out['wide_q27']) == 'ok')
out['demo_confirms'] = ok
print(json.dumps(out, indent=1))
with open('/root/repo/BENCH_SF200.json', 'w') as f:
    json.dump(out, f, indent=1)
print('wrote /root/repo/BENCH_SF200.json; demo_confirms =', ok)
EOF
