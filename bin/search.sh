#!/usr/bin/env bash
# graft search — wraps graft.tools.SearchTool
# usage: bin/search.sh <landingDir> <stagingDir> <bucket> <whereSql> [limit] [startKey]
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
graft_run graft.tools.SearchTool "$@"
