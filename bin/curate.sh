#!/usr/bin/env bash
# graft curate — wraps graft.tools.CurateTool (corpus health audit +
# one-call curation: exact dedup → near-dup keep-best → quality floor).
# usage: bin/curate.sh <corpusDir>                      # audit only
#        bin/curate.sh <corpusDir> <outDir> [minQuality] # curate + audits
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
graft_run graft.tools.CurateTool "$@"
