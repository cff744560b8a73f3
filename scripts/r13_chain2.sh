#!/bin/bash
# Round-13 chain 2 (post-compile follow-ups) — sequential, NOTHING
# CPU-heavy beside it.
#  A. Isolated best-of-3 at x100 + x1000 for the two round-13 operators
#     (corpus_dup_by_source, dedup_threshold_sweep).
#  B. knn_graph_refine isolated best-of-3 at x1000 re-measure (post
#     variance attribution; compare spread against the r12 1.6×).
#  C. sf0.1 headline re-run on the 129-key registry.
set -u
cd /root/repo
mkdir -p /tmp/r13
export SPARK_GRAFT_SCRATCH_BYTES=32212254720

SPARK_GRAFT_SF_DIR=/root/repo/.bench/x100 \
  SPARK_GRAFT_ONLY=corpus_dup_by_source,dedup_threshold_sweep \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_BENCH_OUT=/tmp/r13/newops_x100.json \
  scripts/run_main.sh graft.Bench > /tmp/r13/newops_x100.log 2>&1
echo "A newops-x100 rc=$?" >> /tmp/r13/progress2

SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 \
  SPARK_GRAFT_ONLY=corpus_dup_by_source,dedup_threshold_sweep \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_BENCH_OUT=/tmp/r13/newops_x1000.json \
  scripts/run_main.sh graft.Bench > /tmp/r13/newops_x1000.log 2>&1
echo "A newops-x1000 rc=$?" >> /tmp/r13/progress2

SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_ONLY=knn_graph_refine \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_BENCH_OUT=/tmp/r13/refine_x1000_post.json \
  scripts/run_main.sh graft.Bench > /tmp/r13/refine_x1000_post.log 2>&1
echo "B refine-x1000 rc=$?" >> /tmp/r13/progress2

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SHUFFLE_PARTITIONS=32 \
  SPARK_GRAFT_BENCH_OUT=bench_r13_sf01.json \
  scripts/run_main.sh graft.Bench > /tmp/r13/sf01_129.log 2>&1
echo "C sf01-129 rc=$?" >> /tmp/r13/progress2
echo "R13-CHAIN2-DONE" >> /tmp/r13/progress2
