#!/bin/bash
# Launch a graft main fully detached (survives the parent shell), on a
# SNAPSHOT classpath (/tmp/graft_r12_classes) so sbt recompiles during the
# run can't swap class files under a lazily-loading JVM.
#   tools/bench_detached.sh LOGFILE <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 64g) + the usual SPARK_GRAFT_* knobs.
LOG="$1"; shift
CP="${GRAFT_CP:-/tmp/graft_r12_classes}:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
setsid nohup java -Xmx${SPARK_DRIVER_MEM:-64g} \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@" > "$LOG" 2>&1 &
echo "launched pid $! -> $LOG"
