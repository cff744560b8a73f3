#!/bin/bash
# Three-point scaling bench: sf0.1 (base), .bench/sf1 (10x), .bench/sf10
# (100x, from tools/ScaleData). Writes one Bench JSON per point, then the
# caller regenerates BENCH_SCALING.md via scripts/scaling_report.py.
# Run detached (setsid nohup ...); legs are sequential and NOTHING
# CPU-heavy may run in parallel or the timings pollute.
set -u
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_scaling_sf01.json \
  sbt -batch "runMain graft.Bench" > /tmp/benchchain_sf01.log 2>&1 \
&& SPARK_GRAFT_SF_DIR=/root/repo/.bench/sf1 SPARK_GRAFT_BENCH_OUT=bench_scaling_sf1.json \
  sbt -batch "runMain graft.Bench" > /tmp/benchchain_sf1.log 2>&1 \
&& SPARK_GRAFT_SF_DIR=/root/repo/.bench/sf10 SPARK_GRAFT_BENCH_OUT=bench_scaling_sf10.json \
  sbt -batch "runMain graft.Bench" > /tmp/benchchain_sf10.log 2>&1
echo "BENCH-CHAIN-DONE rc=$?" > /tmp/benchchain.done
