#!/bin/bash
# Round-16 AFTER measurements, batch 1 (same methodology as the before
# chain: small-group ×1000, min-of-3 = steady state, rep1 carries builds).
set -u
cd /root/repo
mkdir -p /tmp/r16
export SPARK_GRAFT_SCRATCH_BYTES=32212254720
export SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000

SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_ONLY=text_salient_terms,text_top_term,text_bm25,knn_graph_recall,q_profit,q_waiting_suppliers \
  SPARK_GRAFT_BENCH_OUT=bench_r16_targets_x1000_after.json \
  scripts/run_main.sh graft.Bench > /tmp/r16/targets_after.log 2>&1
echo "C targets-after rc=$?" >> /tmp/r16/progress

SPARK_GRAFT_REPS=2 \
  SPARK_GRAFT_ONLY=dedup_ngram_jaccard \
  SPARK_GRAFT_BENCH_OUT=bench_r16_ngram_x1000_after.json \
  scripts/run_main.sh graft.Bench > /tmp/r16/ngram_after.log 2>&1
echo "D ngram-after rc=$?" >> /tmp/r16/progress
echo "R16-AFTER1-DONE" >> /tmp/r16/progress
