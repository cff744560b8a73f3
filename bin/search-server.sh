#!/usr/bin/env bash
# graft search-server — wraps graft.search.SearchServer
# usage: bin/search-server.sh <landingDir> <stagingDir> [cacheTtlMillis]
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
graft_run graft.search.SearchServer "$@"
