#!/usr/bin/env bash
# graft compact — wraps graft.tools.CompactorTool
# usage: bin/compact.sh <path/to/graft.conf> <numPartitions> [<bucket>] [<force>] 
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
graft_run graft.tools.CompactorTool "$@"
