#!/bin/bash
# graft master startup: cron (compactor schedule) + supervisord (spark
# master + resident ingestion). Counterpart of the reference's startup.sh
# (docker/images/docker-spark/master/startup.sh) minus its Zenko
# credential bootstrap — zone paths come from the mounted graft.conf.
set -eo pipefail

mkdir -p /graft/logs /graft/heapdumps

echo "Starting cron (compactor schedule)"
service cron start

export SPARK_MASTER_HOST=$(hostname)

# supervisor keeps the master and the ingestion stream up
exec supervisord -c /etc/supervisor/supervisord.conf -n
