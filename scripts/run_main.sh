#!/usr/bin/env bash
# Direct JVM launcher for graft mains (no sbt lock): compiled classes +
# the unmanaged Spark jars, with the Java-17 module opens Spark needs.
set -euo pipefail
MAIN=${1:?usage: run_main.sh <mainClass> [args...]}
shift
REPO=$(cd "$(dirname "$0")/.." && pwd)
# Heap is overridable: serving benches over big on-disk stores want a
# SMALL heap (GRAFT_XMX=48g) so the OS page cache can hold the store —
# measured at 100M: the 1000q/rerank=10000 warm wave is 50 s at 48g vs
# 190 s at 100g (wave-1 garbage grows the heap to ~100 GB, evicting the
# 26 GB vectors store and turning wave 2 into a GC + re-read fight).
exec java -Xmx"${GRAFT_XMX:-100g}" \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Dio.netty.tryReflectionSetAccessible=true \
  -cp "${GRAFT_CLASSES:-$REPO/target/scala-2.13/classes}:/opt/spark/jars/*" \
  "$MAIN" "$@"
