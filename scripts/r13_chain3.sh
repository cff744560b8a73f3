#!/bin/bash
# Round-13 chain 3: the canonical warm x1000 suite on the FINAL shipped
# tree (post dotf + text_ngram_stats rework). Zones warm from the cold
# leg; per-query zone_built flags prove the regime.
set -u
cd /root/repo
export SPARK_GRAFT_SCRATCH_BYTES=32212254720
SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=bench_scaling_x1000_full_r13.json \
  scripts/run_main.sh graft.Bench > /tmp/r13/x1000_warm_final.log 2>&1
echo "x1000-warm-final rc=$?" >> /tmp/r13/progress3
echo "R13-CHAIN3-DONE" >> /tmp/r13/progress3
