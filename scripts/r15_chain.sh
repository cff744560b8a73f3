#!/bin/bash
# Round-15 measurement chain. Sequential; NOTHING CPU-heavy may run
# beside it. The scale corpora survived from round 14 this time, so no
# regeneration leg. Legs:
#  D. Controlled sf0.1 headline at HEAD, all 142 queries, 2 reps
#     (VERDICT #3) -> bench_r15_sf01.json. Runs FIRST (short) while the
#     existing zone store keeps it warm-steady-state like r13/r14.
#  C. sf1 correctness gate refresh on the current tree -> VERIFY_SF1.json.
#  A. COLD full x1000: the zone store is wiped, so all 15 DerivedZone
#     artifacts (incl. the round-15 lm_doc_score / dsir_doc_score /
#     text_tf_df) rebuild in-suite, zone_built-flagged
#     -> bench_scaling_x1000_full_r15_cold.json.
#  B. WARM full x1000 (zones from A) -> bench_scaling_x1000_full_r15.json,
#     the round's CANONICAL scale artifact.
set -u
cd /root/repo
mkdir -p /tmp/r15
export SPARK_GRAFT_SCRATCH_BYTES=32212254720

# D: controlled sf0.1 headline (2 reps, quiet machine, at HEAD)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REPS=2 \
  SPARK_GRAFT_BENCH_OUT=bench_r15_sf01.json \
  scripts/run_main.sh graft.Bench > /tmp/r15/sf01_headline.log 2>&1
echo "D sf01-headline rc=$?" >> /tmp/r15/progress

# C: sf1 gate refresh on the current tree
scripts/run_main.sh graft.Verify .bench/x10 /tmp/r15/verify_sf1 \
  > /tmp/r15/verify_sf1.log 2>&1
echo "C verify-sf1 rc=$?" >> /tmp/r15/progress
python3 scripts/crosscheck.py .bench/x10 /tmp/r15/verify_sf1 VERIFY_SF1.json \
  > /tmp/r15/crosscheck_sf1.log 2>&1
echo "C crosscheck-sf1 rc=$?" >> /tmp/r15/progress

# A: cold full x1000 (zone store wiped first — every build lands in-suite)
rm -rf "${TMPDIR:-/tmp}/graft-derived"
SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=bench_scaling_x1000_full_r15_cold.json \
  scripts/run_main.sh graft.Bench > /tmp/r15/x1000_cold.log 2>&1
echo "A x1000-cold rc=$?" >> /tmp/r15/progress

# B: warm full x1000 (zones from A) — the canonical artifact
SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=bench_scaling_x1000_full_r15.json \
  scripts/run_main.sh graft.Bench > /tmp/r15/x1000_warm.log 2>&1
echo "B x1000-warm rc=$?" >> /tmp/r15/progress
echo "R15-CHAIN-DONE" >> /tmp/r15/progress
