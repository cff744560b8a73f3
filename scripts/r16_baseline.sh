#!/bin/bash
# Round-16 BASELINE measurement chain (before any optimization). Legs are
# sequential; NOTHING CPU-heavy may run beside it.
#  A. Small-group ×1000 run, REPS=3, of every query the round-15 verdict
#     flagged for isolated re-measure plus this round's optimization
#     targets. min-of-3 strips first-touch zone builds (runs[] keeps them
#     auditable) -> bench_r16_targets_x1000_before.json
#  B. dedup_ngram_jaccard alone at ×1000, REPS=2 — rep 1 carries the
#     dedup_shared_counts build (the 382.6 s verdict headline), rep 2 is
#     steady state -> bench_r16_ngram_x1000_before.json
set -u
cd /root/repo
mkdir -p /tmp/r16
export SPARK_GRAFT_SCRATCH_BYTES=32212254720
export SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000

SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_ONLY=q_rollup,text_decontaminate,events_sessionize,dedup_semantic,text_salient_terms,mvcc_asof,knn_graph_recall,q_profit,q_waiting_suppliers,list_versions,knn_hard_negatives,dedup_threshold_sweep,dedup_embedding \
  SPARK_GRAFT_BENCH_OUT=bench_r16_targets_x1000_before.json \
  scripts/run_main.sh graft.Bench > /tmp/r16/targets_before.log 2>&1
echo "A targets-before rc=$?" >> /tmp/r16/progress

SPARK_GRAFT_REPS=2 \
  SPARK_GRAFT_ONLY=dedup_ngram_jaccard \
  SPARK_GRAFT_BENCH_OUT=bench_r16_ngram_x1000_before.json \
  scripts/run_main.sh graft.Bench > /tmp/r16/ngram_before.log 2>&1
echo "B ngram-before rc=$?" >> /tmp/r16/progress
echo "R16-BASELINE-DONE" >> /tmp/r16/progress
