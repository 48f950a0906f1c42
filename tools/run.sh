#!/bin/bash
# Direct JVM runner for graft mains (bypasses the sbt lock so measurement
# can interleave with builds). Usage: tools/run.sh <MainClass> [args...]
# Mirrors build.sbt's forked-run JVM flags exactly.
set -u
CLS="$1"; shift
# derive the repo root from this script's location (ADVICE r19: a
# hardcoded path silently ran stale/wrong classes from other checkouts)
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$ROOT/target/scala-2.13/classes"
if [ ! -d "$CLASSES" ]; then
  echo "run.sh: $CLASSES missing — run 'sbt compile' first" >&2
  exit 1
fi
CP="$CLASSES:/opt/spark/jars/*"
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -XX:ReservedCodeCacheSize=512m \
  -cp "$CP" "graft.$CLS" "$@"
