#!/bin/bash
# Run a graft main against the compiled classes without sbt (avoids
# sbt project locks while iterating; identical JVM flags to build.sbt).
# Usage: [JVM_MEM=8g] tools/runmain.sh graft.Bench [args...]
set -e
cd "$(dirname "$0")/.."
MEM="${JVM_MEM:-8g}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx"$MEM" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:target/scala-2.13/classes" "$@"
