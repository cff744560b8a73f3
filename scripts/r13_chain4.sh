#!/bin/bash
# Round-13 chain 4: the second-batch operators at x1000 (isolated
# best-of-3, warm zones from the first rep), then the x10 (sf1) gate
# refreshed on the 138-query tree.
set -u
cd /root/repo
export SPARK_GRAFT_SCRATCH_BYTES=32212254720
mkdir -p /tmp/r13b

SPARK_GRAFT_SF_DIR=/root/repo/.bench/x1000 SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_ONLY=text_bm25,text_charset_profile,text_fertility,text_hash_features,events_growth,events_cooccurrence,events_stickiness,events_seasonality,dedup_lsh_quality \
  SPARK_GRAFT_BENCH_OUT=bench_scaling_x1000_newops_r13.json \
  scripts/run_main.sh graft.Bench > /tmp/r13b/x1000_newops.log 2>&1
echo "x1000-newops rc=$?" >> /tmp/r13b/progress

scripts/run_main.sh graft.tools.ScaleData /root/testdata/sf0.1 .bench/x10 10 \
  > /tmp/r13b/scaledata_x10.log 2>&1
echo "x10-gen rc=$?" >> /tmp/r13b/progress

scripts/run_main.sh graft.Verify .bench/x10 /tmp/verify_sf1 \
  > /tmp/r13b/verify_sf1.log 2>&1
echo "verify-sf1 rc=$?" >> /tmp/r13b/progress

python3 scripts/crosscheck.py .bench/x10 /tmp/verify_sf1 VERIFY_SF1.json \
  > /tmp/r13b/crosscheck_sf1.log 2>&1
echo "crosscheck-sf1 rc=$?" >> /tmp/r13b/progress
echo "R13-CHAIN4-DONE" >> /tmp/r13b/progress
