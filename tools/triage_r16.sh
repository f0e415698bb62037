#!/bin/bash
# Single-sample per-query sf3 triage (one JVM per query, per-query timeout)
cd /root/repo
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
TMO=${TRIAGE_TIMEOUT:-1500}
for q in "$@"; do
  echo "=== $q start $(date +%H:%M:%S)"
  timeout $TMO env SPARK_GRAFT_SF_DIR=testdata-sf3 SPARK_GRAFT_BENCH_ONLY="$q" \
    SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_OUT=/tmp/triage_$q.json \
    java -Xmx8g $ADDOPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
    > /tmp/triage_$q.log 2>&1
  rc=$?
  t=$(python3 -c "import json;d=json.load(open('/tmp/triage_$q.json'));print(round(d['queries']['$q'],2), d['errors'])" 2>/dev/null || echo "TIMEOUT/ERR rc=$rc")
  echo "=== $q done  $(date +%H:%M:%S)  $t"
  rm -rf /tmp/blockmgr-* 2>/dev/null
done
