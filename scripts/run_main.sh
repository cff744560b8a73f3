#!/usr/bin/env bash
# Run a graft main class on the compiled classes + /opt/spark/jars without
# going through sbt (no build-server lock, so data generation / verify /
# bench runs can overlap). Mirrors build.sbt's fork JVM options.
# Usage: scripts/run_main.sh <mainClass> [args...]
# Env: GRAFT_XMX (default 32g) overrides the heap.
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${GRAFT_XMX:-32g}" \
  -XX:ReservedCodeCacheSize=1g \
  -XX:MaxMetaspaceSize=2g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
