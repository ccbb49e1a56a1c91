#!/bin/bash
# Profile one (or more, comma-separated) bench keys with Spark event logs.
# Usage: scripts/profile_key.sh key1[,key2,...] [sfDir]
# Writes event logs to /tmp/sparklogs/<ts> and prints a per-job summary.
set -e
cd "$(dirname "$0")/.."
KEYS=$1
SF=${2:-/root/testdata/sf0.1}
TS=$(date +%s)
LOGDIR=/tmp/sparklogs/$TS
mkdir -p "$LOGDIR"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_ONLY="$KEYS" SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
java $ADD_OPENS -Xmx8g \
  -Dspark.eventLog.enabled=true -Dspark.eventLog.dir=file://$LOGDIR \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench 2>/dev/null | tail -1
python3 scripts/joblog_summary.py "$LOGDIR"
