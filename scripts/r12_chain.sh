#!/bin/bash
# Round-12 heavy chain — sequential, NOTHING CPU-heavy may run beside it.
#  A. Isolated best-of-3 at x1000 for the four round-11 first-measured
#     heavies (judge task #2): one process per query, Bench derives the
#     Tuning width (128 at x1000), reps=3, min taken.
#  B. CurationBench end-to-end at x1000 (judge task #5) with this host's
#     scratch budget declared so the pair build shards itself.
#  C. 50k-token long-document corpus (judge task #6): ScaleData --longdocs
#     from .bench/x100 at constant token volume, then the 22-key text
#     family suite on it (same composition as the 10k/shortdoc points so
#     in-suite bias cancels in the ratio).
set -u
cd /root/repo
mkdir -p /tmp/r12
TEXTKEYS=corpus_dsir,corpus_mixture,corpus_temperature,pii_scrub,sample_fixed_k,sample_stratified,seq_pack,text_cms,text_decontaminate,text_fingerprint,text_gopher_rules,text_keyword_search,text_langid,text_length_median,text_lm_score,text_ngram_stats,text_perplexity_bucket,text_quality,text_repetition,text_salient_terms,text_tokens,text_top_term

# A: isolated heavies (scratch budget declared for any zone build legs)
export SPARK_GRAFT_SCRATCH_BYTES=32212254720
for q in q_waiting_suppliers knn_graph_refine text_ngram_stats text_top_term; do
  SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_ONLY=$q \
    SPARK_GRAFT_REPS=3 SPARK_GRAFT_BENCH_OUT=/tmp/r12/iso_$q.json \
    scripts/run_main.sh graft.Bench > /tmp/r12/iso_$q.log 2>&1
  echo "iso $q rc=$?" >> /tmp/r12/progress
done

# B: CurationBench at x1000 (width: Tuning-derived; scratch budget above)
SPARK_GRAFT_BENCH_OUT=/tmp/r12/curation_x1000.json \
  scripts/run_main.sh graft.tools.CurationBench /root/repo/.bench/x1000 \
  > /tmp/r12/curation_x1000.log 2>&1
echo "curation rc=$?" >> /tmp/r12/progress

# C: 50k-token corpus + text family suite
scripts/run_main.sh graft.tools.ScaleData --longdocs /root/repo/.bench/x100 \
  /root/repo/.bench/longdoc50k 50000 > /tmp/r12/longdoc_gen.log 2>&1
echo "longdoc-gen rc=$?" >> /tmp/r12/progress
SPARK_GRAFT_SF_DIR=/root/repo/.bench/longdoc50k SPARK_GRAFT_ONLY=$TEXTKEYS \
  SPARK_GRAFT_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/r12/text_longdoc50k.json \
  scripts/run_main.sh graft.Bench > /tmp/r12/text_longdoc50k.log 2>&1
echo "longdoc-suite rc=$?" >> /tmp/r12/progress
echo "R12-CHAIN-DONE" >> /tmp/r12/progress
