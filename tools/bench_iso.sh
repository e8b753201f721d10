#!/bin/bash
# Isolation bench runner: one JVM per query, mirrors build.sbt javaOptions.
# Usage: tools/bench_iso.sh q107_canonical_docs [more...]   (logs to /tmp/iso_<q>.json)
set -u
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for q in "$@"; do
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  java $OPENS -Xmx8g -XX:ReservedCodeCacheSize=512m \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench "$q" >/tmp/iso_"$q".json 2>/tmp/iso_"$q".err
  echo "$q rc=$? $(python3 -c "import json,sys;d=json.load(open('/tmp/iso_$q.json'));print(d['queries'])" 2>/dev/null)"
done
