#!/bin/bash
# Round-12 heavy chain 3 — sequential, NOTHING CPU-heavy beside it.
#  A. Isolated best-of-3 at x100 for the two newest ops + the FIXED
#     text_boilerplate (SHUFFLE_HASH df side).
#  B. Isolated best-of-3 at x1000 for the fixed text_boilerplate.
#  C. Full 127-query sf1 gate refresh (Verify at .bench/x10 + crosscheck).
set -u
cd /root/repo
mkdir -p /tmp/r12
export SPARK_GRAFT_SCRATCH_BYTES=32212254720

SPARK_GRAFT_SF_DIR=/root/repo/.bench/x100 \
  SPARK_GRAFT_ONLY=text_boilerplate,events_inactivity,mm_fingerprint \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_BENCH_OUT=/tmp/r12/newops2_x100.json \
  scripts/run_main.sh graft.Bench > /tmp/r12/newops2_x100.log 2>&1
echo "newops2-x100 rc=$?" >> /tmp/r12/progress3

SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_ONLY=text_boilerplate \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_BENCH_OUT=/tmp/r12/boiler_x1000.json \
  scripts/run_main.sh graft.Bench > /tmp/r12/boiler_x1000.log 2>&1
echo "boiler-x1000 rc=$?" >> /tmp/r12/progress3

scripts/run_main.sh graft.Verify .bench/x10 /tmp/r12/verify_sf1b \
  > /tmp/r12/verify_sf1b.log 2>&1
echo "verify-sf1b rc=$?" >> /tmp/r12/progress3
python3 scripts/crosscheck.py .bench/x10 /tmp/r12/verify_sf1b VERIFY_SF1.json \
  > /tmp/r12/crosscheck_sf1b.log 2>&1
echo "crosscheck-sf1b rc=$?" >> /tmp/r12/progress3
echo "R12-CHAIN3-DONE" >> /tmp/r12/progress3
