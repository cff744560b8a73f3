#!/usr/bin/env bash
# graft ingest — wraps graft.tools.IngestTool (continuous journal → landing)
# usage: bin/ingest.sh <path/to/graft.conf> [<journalDir>] [<intervalMs>]
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
graft_run graft.tools.IngestTool "$@"
