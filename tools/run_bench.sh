#!/bin/bash
# Launch a graft bench main directly with java (no sbt lock): snapshots the
# compiled classes first so a concurrent `sbt compile` can't swap class
# files under a running bench. Usage:
#   SPARK_DRIVER_MEM=96g tools/run_bench.sh graft.bench.CompressedScanBenchMain 1000000 768 ...
set -euo pipefail
MAIN=$1; shift
REPO_ROOT=$(cd "$(dirname "$0")/.." && pwd)
SNAP=$(mktemp -d /tmp/graft-classes-XXXXXX)
trap 'rm -rf "$SNAP"' EXIT
cp -r "$REPO_ROOT"/target/scala-2.13/classes/. "$SNAP"/
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-32g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" \
  "$MAIN" "$@"
