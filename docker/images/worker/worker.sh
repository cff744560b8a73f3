#!/bin/bash
# Start a Spark standalone worker against $SPARK_MASTER (counterpart of
# the reference's worker.sh).
set -eo pipefail
export SPARK_NO_DAEMONIZE=true
exec /opt/spark/sbin/start-worker.sh "$SPARK_MASTER"
