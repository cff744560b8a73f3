#!/bin/bash
# Round-14 measurement chain, part 2 — the scale corpora were wiped with
# /tmp between sessions, so regenerate them, then run the remaining
# VERDICT items on the now-142-query tree. Sequential; NOTHING CPU-heavy
# may run beside it.
#  G. Regenerate .bench/x10 / x100 / x1000 (ScaleData on sf0.1) and the
#     x1000-scale clustered ANN corpus (2M vectors / 20k clusters).
#  H. COLD full x1000 on the 142-query tree (zone store starts empty, so
#     cold comes FIRST this time; zone_built flags make each rebuild
#     self-describing) -> bench_scaling_x1000_full_r14_cold.json.
#  I. WARM full x1000 (zones from H) -> bench_scaling_x1000_full_r14.json,
#     the round's CANONICAL scale artifact (VERDICT #2, now incl. the
#     round-14 ops and events_concentration's first x1000 point).
#  J. ClusteredRecallBench at x1000 scale (caps + refine rounds 1 and 2)
#     -> CLUSTERED_RECALL_X1000.json (VERDICT #7).
#  K. sf1 correctness gate refresh on the 142-query tree -> VERIFY_SF1.json.
#  L. New-op scaling rows: x10 / x100 isolated best-of-3 for the three
#     round-14 ops -> /tmp/r14/newops_x{10,100}.json (folded into
#     BENCH_SCALING.md by hand).
set -u
cd /root/repo
mkdir -p /tmp/r14
export SPARK_GRAFT_SCRATCH_BYTES=32212254720

# G: corpora
scripts/run_main.sh graft.tools.ScaleData /root/testdata/sf0.1 .bench/x10 10 \
  > /tmp/r14/gen_x10.log 2>&1
echo "G x10 rc=$?" >> /tmp/r14/progress
scripts/run_main.sh graft.tools.ScaleData /root/testdata/sf0.1 .bench/x100 100 \
  > /tmp/r14/gen_x100.log 2>&1
echo "G x100 rc=$?" >> /tmp/r14/progress
scripts/run_main.sh graft.tools.ScaleData /root/testdata/sf0.1 .bench/x1000 1000 \
  > /tmp/r14/gen_x1000.log 2>&1
echo "G x1000 rc=$?" >> /tmp/r14/progress
scripts/run_main.sh graft.tools.ClusteredCorpus .bench/clustered_x1000 2000000 20000 \
  > /tmp/r14/clustered_gen.log 2>&1
echo "G clustered rc=$?" >> /tmp/r14/progress

# H: cold full x1000 (zone store empty after the wipe — cold is first)
rm -rf "${TMPDIR:-/tmp}/graft-derived"
SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=bench_scaling_x1000_full_r14_cold.json \
  scripts/run_main.sh graft.Bench > /tmp/r14/x1000_cold.log 2>&1
echo "H x1000-cold rc=$?" >> /tmp/r14/progress

# I: warm full x1000 (zones built by H) — the canonical artifact
SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=bench_scaling_x1000_full_r14.json \
  scripts/run_main.sh graft.Bench > /tmp/r14/x1000_warm.log 2>&1
echo "I x1000-warm rc=$?" >> /tmp/r14/progress

# J: clustered-corpus recall at x1000 scale
SPARK_GRAFT_RECALL_OUT=CLUSTERED_RECALL_X1000.json \
  scripts/run_main.sh graft.tools.ClusteredRecallBench .bench/clustered_x1000 \
  > /tmp/r14/clustered_recall.log 2>&1
echo "J recall rc=$?" >> /tmp/r14/progress

# K: sf1 gate refresh on the 142-query tree
scripts/run_main.sh graft.Verify .bench/x10 /tmp/r14/verify_sf1 \
  > /tmp/r14/verify_sf1.log 2>&1
echo "K verify-sf1 rc=$?" >> /tmp/r14/progress
python3 scripts/crosscheck.py .bench/x10 /tmp/r14/verify_sf1 VERIFY_SF1.json \
  > /tmp/r14/crosscheck_sf1.log 2>&1
echo "K crosscheck-sf1 rc=$?" >> /tmp/r14/progress

# L: new-op scaling rows (isolated, best-of-3, Bench session shape)
for sf in x10 x100; do
  SPARK_GRAFT_SF_DIR=/root/repo/.bench/$sf SPARK_GRAFT_REPS=3 \
    SPARK_GRAFT_ONLY=text_diversity,sample_priority,events_bot_detect \
    SPARK_GRAFT_BENCH_OUT=/tmp/r14/newops_$sf.json \
    scripts/run_main.sh graft.Bench > /tmp/r14/newops_$sf.log 2>&1
  echo "L newops-$sf rc=$?" >> /tmp/r14/progress
done
echo "R14-CHAIN2-DONE" >> /tmp/r14/progress
