#!/bin/bash
# Launch a graft measurement main outside sbt with the same JVM options
# build.sbt injects (Spark 4 on JDK 17 add-opens + UTC session TZ).
# Usage: run_main.sh <MainClass> [Xmx] [program args...] ; env passes through.
MAIN="$1"; XMX="${2:-8g}"; shift 2 2>/dev/null || shift 1
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx$XMX -cp "$CP" "$MAIN" "$@"
