#!/bin/bash
# Round-12 heavy chain 2 — sequential, NOTHING CPU-heavy beside it.
#  A. Regenerate .bench/x10 (factor 10 of sf0.1 = TPC-H ~sf1) and refresh
#     the sf1 correctness gate over all 125 queries -> VERIFY_SF1.json.
#  B. Isolated best-of-3 at x100 for the five round-12 operators.
#  C. Full 125-query suite at x1000 (TPC-H ~sf100) — the robustness point;
#     Bench derives the Tuning width itself.
set -u
cd /root/repo
mkdir -p /tmp/r12
export SPARK_GRAFT_SCRATCH_BYTES=32212254720

scripts/run_main.sh graft.tools.ScaleData /root/testdata/sf0.1 .bench/x10 10 \
  > /tmp/r12/x10_gen.log 2>&1
echo "x10-gen rc=$?" >> /tmp/r12/progress2
scripts/run_main.sh graft.Verify .bench/x10 /tmp/r12/verify_sf1 \
  > /tmp/r12/verify_sf1.log 2>&1
echo "verify-sf1 rc=$?" >> /tmp/r12/progress2
python3 scripts/crosscheck.py .bench/x10 /tmp/r12/verify_sf1 VERIFY_SF1.json \
  > /tmp/r12/crosscheck_sf1.log 2>&1
echo "crosscheck-sf1 rc=$?" >> /tmp/r12/progress2

SPARK_GRAFT_SF_DIR=/root/repo/.bench/x100 \
  SPARK_GRAFT_ONLY=events_markov,events_value_histogram,text_zipf,text_boilerplate,knn_range \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_BENCH_OUT=/tmp/r12/newops_x100.json \
  scripts/run_main.sh graft.Bench > /tmp/r12/newops_x100.log 2>&1
echo "newops-x100 rc=$?" >> /tmp/r12/progress2

SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=/tmp/r12/x1000_full.json \
  scripts/run_main.sh graft.Bench > /tmp/r12/x1000_full.log 2>&1
echo "x1000-full rc=$?" >> /tmp/r12/progress2
echo "R12-CHAIN2-DONE" >> /tmp/r12/progress2
