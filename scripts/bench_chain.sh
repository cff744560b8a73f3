#!/bin/bash
# Three-point scaling bench: sf0.1 (base), .bench/x10 (factor 10),
# .bench/x100 (factor 100, both from tools/ScaleData — dirs named by the
# FACTOR since the round-8 naming erratum). One Bench JSON per point plus
# a warm second-process run at the largest point, then the caller
# regenerates BENCH_SCALING.md's chain sections via
# scripts/scaling_report.py (hand sections below the marker survive).
# Run detached (setsid nohup ...); legs are sequential and NOTHING
# CPU-heavy may run in parallel or the timings pollute.
# Clears the derived-zone root first so "first-run" is truly cold.
set -u
cd /root/repo
rm -rf "${TMPDIR:-/tmp}/graft-derived"
# Chain-ratio legs PIN the core count (Bench's default is now the
# Tuning-derived robustness width, which grows with data — right for
# robustness runs, wrong for like-with-like ratios), and declare this
# host's scratch budget so disk-bounded builds shard themselves.
export SPARK_GRAFT_SHUFFLE_PARTITIONS=32
export SPARK_GRAFT_SCRATCH_BYTES=${SPARK_GRAFT_SCRATCH_BYTES:-32212254720}
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_scaling_sf01.json \
  scripts/run_main.sh graft.Bench > /tmp/benchchain_sf01.log 2>&1 \
&& SPARK_GRAFT_SF_DIR=/root/repo/.bench/x10 SPARK_GRAFT_BENCH_OUT=bench_scaling_x10.json \
  scripts/run_main.sh graft.Bench > /tmp/benchchain_x10.log 2>&1 \
&& SPARK_GRAFT_SF_DIR=/root/repo/.bench/x100 SPARK_GRAFT_BENCH_OUT=bench_scaling_x100.json \
  scripts/run_main.sh graft.Bench > /tmp/benchchain_x100.log 2>&1 \
&& SPARK_GRAFT_SF_DIR=/root/repo/.bench/x100 SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_BENCH_OUT=bench_scaling_x100_warm.json \
  scripts/run_main.sh graft.Bench > /tmp/benchchain_x100_warm.log 2>&1
echo "BENCH-CHAIN-DONE rc=$?" > /tmp/benchchain.done
