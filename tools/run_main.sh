#!/bin/bash
# Direct JVM launcher for graft mains (avoids sbt lock contention when
# chaining long scale runs). Usage:
#   GRAFT_MEM=64g SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.Bench [args...]
set -euo pipefail
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${GRAFT_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
