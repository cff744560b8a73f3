#!/usr/bin/env bash
# graft search — one-shot CLI (wraps graft.tools.SearchTool) or, with
# --http, a thin client for a running HttpSearchServer (the reference's
# client shape: GET /<bucket>?search=<where> — bin/search.py).
#
# usage: bin/search.sh <landingDir> <stagingDir> <bucket> <whereSql> [limit] [startKey]
#        bin/search.sh --http <serverUrl> <bucket> <whereSql> [limit] [startKey]
if [ "${1:-}" = "--http" ]; then
  url="${2:?server url (e.g. http://host:8998)}"
  bucket="${3:?bucket}"
  where="${4:?where sql}"
  limit="${5:-1000}"
  if [ -n "${6:-}" ]; then
    exec curl -sfG "$url/$bucket" --data-urlencode "search=$where" \
      --data-urlencode "limit=$limit" --data-urlencode "start_key=$6"
  fi
  exec curl -sfG "$url/$bucket" --data-urlencode "search=$where" \
    --data-urlencode "limit=$limit"
fi
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
graft_run graft.tools.SearchTool "$@"
