#!/usr/bin/env bash
# Shared launcher plumbing for the graft CLI wrappers (the deployment
# face the reference ships as bin/*.sh + bin/search.py).
#
# Resolution order for the engine classpath:
#   1. GRAFT_JAR             — a deployed assembly jar
#   2. target/scala-2.13/... — a local sbt build (dev checkout)
# Spark jars come from SPARK_HOME/jars (default /opt/spark/jars).
set -euo pipefail
GRAFT_HOME="${GRAFT_HOME:-$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)}"
SPARK_JARS="${SPARK_HOME:-/opt/spark}/jars"
CLASSES="${GRAFT_JAR:-$GRAFT_HOME/target/scala-2.13/classes}"
if [ ! -e "$CLASSES" ]; then
  echo "graft classes not found at $CLASSES — build with 'sbt compile' or set GRAFT_JAR" >&2
  exit 1
fi
graft_run() { # graft_run <mainClass> [args...]
  exec java ${GRAFT_JAVA_OPTS:--Xmx4g} \
    -cp "$CLASSES:$SPARK_JARS/*" "$@"
}
