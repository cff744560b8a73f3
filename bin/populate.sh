#!/usr/bin/env bash
# graft populate — wraps graft.tools.Populator
# usage: bin/populate.sh <landingDir> <bucket> <nRecords> [numFiles] [groupInterval]
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
graft_run graft.tools.Populator "$@"
