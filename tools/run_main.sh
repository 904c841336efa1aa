#!/bin/bash
# Launch a graft measurement main outside sbt with the same JVM options
# build.sbt injects (Spark 4 on JDK 17 add-opens + UTC session TZ).
# Usage: run_main.sh <MainClass> [Xmx] [program args...] ; env passes through.
# The Xmx slot is positional but guarded: anything not shaped like a heap
# size (e.g. a --flag meant for the main) falls through to program args.
MAIN="$1"; shift
if [[ "$1" =~ ^[0-9]+[gGmMkK]$ ]]; then
  XMX="$1"; shift
  echo "[run_main] XMX=$XMX" >&2
else
  # The guard silently reinterpreting arguments was a foot-gun (r19
  # ADVICE): a heap spelled outside the regex (16gb, 8192) falls through
  # to program args at the default heap — say so in the launch log.
  XMX="8g"
  if [[ $# -gt 0 ]]; then
    echo "[run_main] XMX=$XMX (first arg \"$1\" not heap-shaped; passed to main)" >&2
  else
    echo "[run_main] XMX=$XMX (default)" >&2
  fi
fi
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx$XMX -cp "$CP" "$MAIN" "$@"
