#!/bin/bash
# Interleaved same-host A/B of the r16 HEAD (33fc4a8) vs the current HEAD
# over the PQ/MMR family (VERDICT r17 item 1: s08 1.83x, s07/s09 1.69x,
# s10 1.28x slower in the r17 artifact than r16 on UNTOUCHED plans —
# Similarity.scala/VectorExprs.scala git-diff empty vs 33fc4a8 — under a
# BETTER climate stamp, 1.083 vs 1.248; movement against the climate
# gradient concentrated in one family sharing driver-side codebook/LUT
# computation is the one pattern the controls can't absolve). Protocol:
# both trees pre-built, then 3 alternating rounds of (A: r16, B: HEAD),
# each a full Bench invocation (untimed sf0.001 warmup + 3 interleaved
# timed passes, per-query min) on the SAME sf0.1 data. Alternation bounds
# host-climate drift: any slow window hits both sides. Merge + verdict:
# tools/ab_merge.py -> BENCH_AB_PQMMR.json.
#
# NO other sbt/JVM workload may run concurrently (timings poison).
set -x
cd /root/repo || exit 1
R16=33fc4a8
QS=s07_mmr_diversify,s08_pq_encode,s09_adc_search,s10_ivfpq

rm -rf /dev/shm/spark-local* 2>/dev/null
git worktree add -f .ab/r16 $R16 || exit 1

# pre-build both sides so compilation never lands inside a timed window
(cd .ab/r16 && sbt -batch compile) || exit 1
sbt -batch compile || exit 1

rm -f /tmp/abpq_A_*.json /tmp/abpq_B_*.json
for i in 1 2 3; do
  for side in A B; do
    if [ "$side" = A ]; then dir=/root/repo/.ab/r16; else dir=/root/repo; fi
    (cd "$dir" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_DRIVER_MEM=64g SPARK_GRAFT_BENCH_PASSES=3 \
      SPARK_GRAFT_BENCH_OUT=/tmp/abpq_${side}_${i}.json \
      sbt -batch "runMain graft.Bench $QS") || exit 1
  done
done

python3 tools/ab_merge.py /tmp/abpq BENCH_AB_PQMMR.json r16 \
  "3 alternating rounds of (r16 33fc4a8, HEAD), each a full Bench run (sf0.001 warmup + 3 timed passes) of s07/s08/s09/s10 at sf0.1 local[32]; per-query min over all 9 samples per side" \
  || exit 1
git worktree remove --force .ab/r16
date
