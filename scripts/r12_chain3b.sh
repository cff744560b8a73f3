#!/bin/bash
# Round-12 chain 3b: re-measure text_boilerplate on the NGrams shape
# (x100 + x1000 isolated best-of-3), then the full 127-query sf1 gate.
set -u
cd /root/repo
mkdir -p /tmp/r12
export SPARK_GRAFT_SCRATCH_BYTES=32212254720

SPARK_GRAFT_SF_DIR=/root/repo/.bench/x100 SPARK_GRAFT_ONLY=text_boilerplate \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_BENCH_OUT=/tmp/r12/boiler2_x100.json \
  scripts/run_main.sh graft.Bench > /tmp/r12/boiler2_x100.log 2>&1
echo "boiler2-x100 rc=$?" >> /tmp/r12/progress3b

SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_ONLY=text_boilerplate \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_BENCH_OUT=/tmp/r12/boiler2_x1000.json \
  scripts/run_main.sh graft.Bench > /tmp/r12/boiler2_x1000.log 2>&1
echo "boiler2-x1000 rc=$?" >> /tmp/r12/progress3b

scripts/run_main.sh graft.Verify .bench/x10 /tmp/r12/verify_sf1b \
  > /tmp/r12/verify_sf1b.log 2>&1
echo "verify-sf1b rc=$?" >> /tmp/r12/progress3b
python3 scripts/crosscheck.py .bench/x10 /tmp/r12/verify_sf1b VERIFY_SF1.json \
  > /tmp/r12/crosscheck_sf1b.log 2>&1
echo "crosscheck-sf1b rc=$?" >> /tmp/r12/progress3b
echo "R12-CHAIN3B-DONE" >> /tmp/r12/progress3b
