#!/usr/bin/env bash
# Direct JVM launcher for graft mains (no sbt lock): compiled classes +
# the unmanaged Spark jars, with the Java-17 module opens Spark needs.
set -euo pipefail
MAIN=${1:?usage: run_main.sh <mainClass> [args...]}
shift
REPO=$(cd "$(dirname "$0")/.." && pwd)
exec java -Xmx100g \
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
