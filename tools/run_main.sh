#!/bin/bash
# Run a graft main class without sbt (same JVM flags as build.sbt's
# fork): tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/out
# Honors SPARK_DRIVER_MEM (default 8g) like the sbt fork does.
set -e
CLS="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# Derive the repo root from this script's own location so a scratch
# checkout runs ITS classes, not /root/repo's — and fail loudly when
# the classes are missing instead of silently running stale code.
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$ROOT/target/scala-2.13/classes"
if [ ! -d "$CLASSES" ]; then
  echo "run_main.sh: $CLASSES missing — run 'sbt compile' in $ROOT first" >&2
  exit 1
fi
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" \
  "$CLS" "$@"
