#!/bin/bash
# Run a graft main class directly on the compiled classes, bypassing
# sbt — so a multi-hour Verify/Bench JVM doesn't hold the sbt project
# lock while development continues. Mirrors build.sbt's javaOptions
# (JDK17 add-opens, UTC, code cache, SPARK_DRIVER_MEM/PRETOUCH).
#
# Usage: tools/run_main.sh <mainClass> [args...]
# Requires a prior `sbt -batch compile` (checks the classes dir).
set -u
cd /root/repo
CLASSES=target/scala-2.13/classes
test -d "$CLASSES" || { echo "run_main: $CLASSES missing — sbt compile first" >&2; exit 1; }

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

MEM="${SPARK_DRIVER_MEM:-48g}"
PRETOUCH=""
if [ "${SPARK_GRAFT_PRETOUCH:-0}" = "1" ]; then
  PRETOUCH="-Xms$MEM -XX:+AlwaysPreTouch"
fi

exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" $PRETOUCH \
  -XX:ReservedCodeCacheSize=1g \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
