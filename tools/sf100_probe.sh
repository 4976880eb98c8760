#!/bin/bash
# Decade-3 (sf100, ~16 GB) probe — runs AFTER the r11 bench chain.
# Subset per tools/sf100_notes.json: scan-bound headliners + the dedup
# third point + trained similarity chain + text kernels, 2 passes;
# the quadratic-by-contract cell-local pair (d11/d13, pinned k=16) at
# 1 pass; then merge_raw + sf1_report vs the fresh sf10 raw.
set -x
cd /root/repo

if [ ! -f testdata/sf100/lineitem.parquet ]; then
  echo "=== GEN sf100 $(date) ==="
  python3 tools/gen_scale.py /root/testdata/sf0.1 /root/repo/testdata/sf100 1000 || exit 1
fi

Q2PASS="q12_pricing_summary,q13_region_revenue,q26_price_percentiles,q29_salted_join,q32_ship_priority,q34_nation_trade,q52_pagerank,q60_sole_shipper,q61_part_variety,q66_bfs_depths,q68_nation_value,q72_nation_value_wide,q70_decile_bins,d01_dedup_exact,d14_semantic_dedup_scaled,s03_ann_ivf,s10_ivfpq,s11_kmeans_train,s12_ann_ivf_trained,t03_tokens,t17_bloom_contamination"
Q1PASS="d11_semantic_dedup,d13_semantic_dedup_trained"

echo "=== STAGE sf100 2-pass $(date) ==="
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  SPARK_GRAFT_BENCH_PASSES=2 SPARK_GRAFT_BENCH_OUTLIER_SEC=10000 \
  SPARK_GRAFT_BENCH_OUT=/tmp/BENCH_SF100_A.json \
  sbt -batch "runMain graft.Bench $Q2PASS" || exit 1

echo "=== STAGE sf100 1-pass (cell-local quadratic family) $(date) ==="
SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_BENCH_OUTLIER_SEC=10000 \
  SPARK_GRAFT_BENCH_OUT=/tmp/BENCH_SF100_B.json \
  sbt -batch "runMain graft.Bench $Q1PASS" || exit 1

python3 tools/merge_raw.py /tmp/BENCH_SF100_A.json /tmp/BENCH_SF100_B.json BENCH_SF100_RAW.json || exit 1

echo "=== OVERFLOW GATE DEMO (expected to trip at sf100) $(date) ==="
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.Verify /root/repo/testdata/sf100 /tmp/v_sf100 q63_kmv_distinct" 2>&1 | tail -15
echo "verify_exit=${PIPESTATUS[0]}"

echo "=== ALLDONE $(date) ==="
