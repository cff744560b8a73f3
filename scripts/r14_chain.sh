#!/bin/bash
# Round-14 measurement chain — sequential, NOTHING CPU-heavy beside it.
#  A. Controlled sf0.1 headline (reps=2, sp=32, quiet machine) — the
#     r13 +11% drift re-measurement VERDICT #3 asked for.
#  B. WARM full x1000 on the 139-query tree (zones from the existing
#     store; doc_quality zone freshly built) -> the round's CANONICAL
#     scale artifact, folding the r13 newops split + events_concentration
#     (first-ever x1000 point) into one file (VERDICT #2).
#  C. COLD full x1000 (zone store cleared) -> the for-the-record run.
#  D. Clustered corpus at x1000 scale (2M vectors, 20k clusters — same
#     per-cluster density as the x100 corpus) + ClusteredRecallBench
#     (caps + refine rounds 1 and 2) -> CLUSTERED_RECALL_X1000.json
#     (VERDICT #7: the rounds-knob cost/recall curve at x1000).
#  E. sf1 correctness gate refresh on the current tree -> VERIFY_SF1.json.
set -u
cd /root/repo
mkdir -p /tmp/r14
export SPARK_GRAFT_SCRATCH_BYTES=32212254720

# A: controlled headline
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SHUFFLE_PARTITIONS=32 \
  SPARK_GRAFT_BENCH_OUT=bench_r14_sf01.json \
  scripts/run_main.sh graft.Bench > /tmp/r14/sf01.log 2>&1
echo "A sf01 rc=$?" >> /tmp/r14/progress

# B: warm full x1000 (reps=1, Tuning width — canonical)
SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=bench_scaling_x1000_full_r14.json \
  scripts/run_main.sh graft.Bench > /tmp/r14/x1000_warm.log 2>&1
echo "B x1000-warm rc=$?" >> /tmp/r14/progress

# C: cold full x1000 (zone store cleared first)
rm -rf /tmp/graft-derived
SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=bench_scaling_x1000_full_r14_cold.json \
  scripts/run_main.sh graft.Bench > /tmp/r14/x1000_cold.log 2>&1
echo "C x1000-cold rc=$?" >> /tmp/r14/progress

# D: clustered-corpus recall at x1000 scale
scripts/run_main.sh graft.tools.ClusteredCorpus .bench/clustered_x1000 2000000 20000 \
  > /tmp/r14/clustered_gen.log 2>&1
echo "D gen rc=$?" >> /tmp/r14/progress
SPARK_GRAFT_RECALL_OUT=CLUSTERED_RECALL_X1000.json \
  scripts/run_main.sh graft.tools.ClusteredRecallBench .bench/clustered_x1000 \
  > /tmp/r14/clustered_recall.log 2>&1
echo "D recall rc=$?" >> /tmp/r14/progress

# E: sf1 gate refresh (x10 tree already generated in round 13)
scripts/run_main.sh graft.Verify .bench/x10 /tmp/verify_sf1_r14 \
  > /tmp/r14/verify_sf1.log 2>&1
echo "E verify-sf1 rc=$?" >> /tmp/r14/progress
python3 scripts/crosscheck.py .bench/x10 /tmp/verify_sf1_r14 VERIFY_SF1.json \
  > /tmp/r14/crosscheck_sf1.log 2>&1
echo "E crosscheck-sf1 rc=$?" >> /tmp/r14/progress
echo "R14-CHAIN-DONE" >> /tmp/r14/progress
