#!/usr/bin/env bash
# graft info — wraps graft.tools.StorageInfo
# usage: bin/info.sh <zoneDir> [zoneDir ...] 
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
graft_run graft.tools.StorageInfo "$@"
