#!/bin/bash
# Quiet bench triple: 3 sequential cold runs, copying target/bench.json after each.
set -e
cd "$(dirname "$0")/.."
TAG=${1:-r12_final}
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
for i in 1 2 3; do
  echo "=== run $i start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench > /dev/null 2> "target/bench_${TAG}_${i}.log"
  cp target/bench.json "bench/bench_${TAG}_${i}.json"
  echo "=== run $i done $(date +%T) total=$(python3 -c "import json;print(json.load(open('target/bench.json'))['value'])") ==="
done
echo "TRIPLE DONE"
