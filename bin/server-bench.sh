#!/usr/bin/env bash
# graft server-bench — wraps graft.tools.ServerBench (warm-executor
# amortization measurement: cold snapshot build vs cached-snapshot query)
# usage: bin/server-bench.sh [buckets] [eventsPerBucket] [warmReps]
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
graft_run graft.tools.ServerBench "$@"
