#!/bin/bash
# Interleaved same-host A/B of the r14 HEAD (80b976b) vs the current HEAD
# over the BENCH_r15 top movers (VERDICT r15 item 1: the committed r15
# artifact read 1.29x over r14 on 123 plan-identical queries; q47 4x and
# q48 2.8x exceeded the documented +-40% host band). Protocol: both trees
# pre-built, then 3 alternating rounds of (A: r14, B: HEAD), each a full
# Bench invocation (untimed sf0.001 warmup + 3 interleaved timed passes,
# per-query min) on the SAME sf0.1 data. Alternation bounds host-climate
# drift: any slow window hits both sides. Merge + verdict:
# tools/ab_merge.py -> BENCH_AB_R14R15.json.
#
# NO other sbt/JVM workload may run concurrently (timings poison).
set -x
cd /root/repo || exit 1
R14=80b976b
QS=q01_latest_wins,q06_json_extract,q08_profiles_view,q12_pricing_summary,q42_cust_order_dist,q43_idle_customers,q47_gap_fill,q48_revenue_forecast

rm -rf /dev/shm/spark-local* 2>/dev/null
git worktree add -f .ab/r14 $R14 || exit 1

# pre-build both sides so compilation never lands inside a timed window
(cd .ab/r14 && sbt -batch compile) || exit 1
sbt -batch compile || exit 1

rm -f /tmp/ab_A_*.json /tmp/ab_B_*.json
for i in 1 2 3; do
  for side in A B; do
    if [ "$side" = A ]; then dir=/root/repo/.ab/r14; else dir=/root/repo; fi
    (cd "$dir" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_DRIVER_MEM=64g SPARK_GRAFT_BENCH_PASSES=3 \
      SPARK_GRAFT_BENCH_OUT=/tmp/ab_${side}_${i}.json \
      sbt -batch "runMain graft.Bench $QS") || exit 1
  done
done

python3 tools/ab_merge.py /tmp/ab BENCH_AB_R14R15.json || exit 1
git worktree remove --force .ab/r14
date
