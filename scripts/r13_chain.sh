#!/bin/bash
# Round-13 heavy chain — sequential, NOTHING CPU-heavy may run beside it.
#  A. sf0.1 headline (reps=2, sp=32 — same shape as bench_r12_sf01.json).
#  B. WARM full x1000 suite on the shipped tree (zones from the existing
#     /tmp/graft-derived store; per-query zone_built flags make any
#     rebuild self-describing) -> the round's CANONICAL scale artifact.
#  C. knn_graph_refine variance attribution: 3 separate GraphProbe
#     --refine processes at x1000, Bench session parity (local[32],
#     sp=192) — deterministic stage counts + per-stage walls + GC.
#  D. COLD full x1000 (zone store cleared) -> the for-the-record run.
#  E. sf1 correctness gate refresh (valueHistogram faces changed).
#  F. Refine rounds-knob cost row at x100: rounds=1 vs rounds=2, reps=3.
#  G. Constant-vocabulary control corpora (factor 100 / 1000 of sf0.1,
#     verbatim text -> key space pinned to the source corpus) + the
#     n-gram-keyed text legs on both -> key-growth attribution.
set -u
cd /root/repo
mkdir -p /tmp/r13
export SPARK_GRAFT_SCRATCH_BYTES=32212254720

# A: headline
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SHUFFLE_PARTITIONS=32 \
  SPARK_GRAFT_BENCH_OUT=bench_r13_sf01.json \
  scripts/run_main.sh graft.Bench > /tmp/r13/sf01.log 2>&1
echo "A sf01 rc=$?" >> /tmp/r13/progress

# B: warm full x1000 (reps=1, Tuning width — same shape as r12's full run)
SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=bench_scaling_x1000_full_r13.json \
  scripts/run_main.sh graft.Bench > /tmp/r13/x1000_warm.log 2>&1
echo "B x1000-warm rc=$?" >> /tmp/r13/progress

# C: refine probes (separate processes — the r12 spread was cross-rep in
# one process, but separate processes also expose heap/GC state effects)
for i in 1 2 3; do
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTITIONS=192 \
    scripts/run_main.sh graft.tools.GraphProbe --refine /root/repo/.bench/x1000 \
    > /tmp/r13/refineprobe_$i.log 2>&1
  echo "C probe$i rc=$?" >> /tmp/r13/progress
done

# D: cold full x1000
rm -rf "${TMPDIR:-/tmp}/graft-derived"
SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=bench_scaling_x1000_full_r13_cold.json \
  scripts/run_main.sh graft.Bench > /tmp/r13/x1000_cold.log 2>&1
echo "D x1000-cold rc=$?" >> /tmp/r13/progress

# E: sf1 gate refresh
scripts/run_main.sh graft.Verify .bench/x10 /tmp/r13/verify_sf1 \
  > /tmp/r13/verify_sf1.log 2>&1
echo "E verify-sf1 rc=$?" >> /tmp/r13/progress
python3 scripts/crosscheck.py .bench/x10 /tmp/r13/verify_sf1 VERIFY_SF1.json \
  > /tmp/r13/crosscheck_sf1.log 2>&1
echo "E crosscheck-sf1 rc=$?" >> /tmp/r13/progress

# F: rounds knob cost row (x100, isolated best-of-3, same session shape)
SPARK_GRAFT_SF_DIR=/root/repo/.bench/x100 SPARK_GRAFT_ONLY=knn_graph_refine \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_BENCH_OUT=/tmp/r13/refine_r1_x100.json \
  scripts/run_main.sh graft.Bench > /tmp/r13/refine_r1_x100.log 2>&1
echo "F refine-r1 rc=$?" >> /tmp/r13/progress
SPARK_GRAFT_SF_DIR=/root/repo/.bench/x100 SPARK_GRAFT_ONLY=knn_graph_refine \
  SPARK_GRAFT_REFINE_ROUNDS=2 \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_BENCH_OUT=/tmp/r13/refine_r2_x100.json \
  scripts/run_main.sh graft.Bench > /tmp/r13/refine_r2_x100.log 2>&1
echo "F refine-r2 rc=$?" >> /tmp/r13/progress

# G: constant-vocabulary control corpora + n-gram-keyed text legs
scripts/run_main.sh graft.tools.ScaleData --constvocab /root/testdata/sf0.1 \
  /root/repo/.bench/cv100 100 > /tmp/r13/cv100_gen.log 2>&1
echo "G cv100-gen rc=$?" >> /tmp/r13/progress
scripts/run_main.sh graft.tools.ScaleData --constvocab /root/testdata/sf0.1 \
  /root/repo/.bench/cv1000 1000 > /tmp/r13/cv1000_gen.log 2>&1
echo "G cv1000-gen rc=$?" >> /tmp/r13/progress
CVKEYS=text_ngram_stats,text_top_term,text_boilerplate
SPARK_GRAFT_SF_DIR=/root/repo/.bench/cv100 SPARK_GRAFT_ONLY=$CVKEYS \
  SPARK_GRAFT_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/r13/cv100.json \
  scripts/run_main.sh graft.Bench > /tmp/r13/cv100.log 2>&1
echo "G cv100 rc=$?" >> /tmp/r13/progress
SPARK_GRAFT_SF_DIR=/root/repo/.bench/cv1000 SPARK_GRAFT_ONLY=$CVKEYS \
  SPARK_GRAFT_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/r13/cv1000.json \
  scripts/run_main.sh graft.Bench > /tmp/r13/cv1000.log 2>&1
echo "G cv1000 rc=$?" >> /tmp/r13/progress
echo "R13-CHAIN-DONE" >> /tmp/r13/progress
