#!/bin/bash
# Dev helper: run a graft main from the packaged jar (sbt stays free).
# Usage: runjar.sh [-Xmx..g] <MainClass> [args...]  (env knobs pass through)
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
XMX="-Xmx48g"
if [[ "$1" == -Xmx* ]]; then XMX="$1"; shift; fi
JAR="${GRAFT_JAR:-/root/repo/target/scala-2.13/etlpipelinetelecomspark_2.13-0.1.0.jar}"
exec java $ADDOPENS $XMX -XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$JAR:/opt/spark/jars/*" "$@"
