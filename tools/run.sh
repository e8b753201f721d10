#!/usr/bin/env bash
# Run a graft main class against the compiled classes + Spark jars.
# Usage: tools/run.sh <MainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
MAIN="$1"; shift
# ReservedCodeCacheSize: a 128-query bench session compiles ~158MB of the
# 240MB JDK default (r8 ledger); a full cache disables the JIT mid-run.
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -XX:ReservedCodeCacheSize=512m \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$CP" "$MAIN" "$@"
