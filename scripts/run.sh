#!/bin/bash
# Fast dev loop: compile with sbt once (scripts/build.sh), then run any
# graft main class directly with java — skips sbt JVM startup.
# Usage: scripts/run.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
set -e
CP_FILE=/tmp/cp.txt
if [ ! -f "$CP_FILE" ]; then
  (cd /root/repo && sbt -batch "export Runtime/fullClasspath" 2>/dev/null \
    | grep -E '^/' | tail -1 > "$CP_FILE")
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" $EXTRA_JAVA_OPTS \
  -cp "$(cat $CP_FILE)" "$@"
