#!/bin/bash
# Direct-java ScalingBench launcher (no sbt lock/startup) — required for the
# CONCURRENT-independent-JVMs multi-heap proxy, where 4 benches run at once.
#   tools/scaling_java.sh <sfDir> <repl> <levelSpec> <reps> <outTag> [xmx] [cpus]
# levelSpec: "8" -> local[8]; "WxCxMB" -> local-cluster (needs SPARK_HOME).
# The whole JVM is sized like an N-core executor: -XX:ActiveProcessorCount
# defaults to the level's total cores (override with arg 7).
set -e
cd "$(dirname "$0")/.."
SF=${1:?sfDir}; REPL=${2:?repl}; SPEC=${3:?level}; REPS=${4:-1}; TAG=${5:-$SPEC}
XMX=${6:-12g}
if [[ "$SPEC" == *x* ]]; then CORES_DEFAULT=$(( $(echo "$SPEC" | cut -dx -f1) * $(echo "$SPEC" | cut -dx -f2) )); else CORES_DEFAULT=$SPEC; fi
CPUS=${7:-$CORES_DEFAULT}
export SPARK_HOME=${SPARK_HOME:-/opt/spark}
export SPARK_SCALA_VERSION=${SPARK_SCALA_VERSION:-2.13}
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# ABSOLUTE paths only: executor JVMs receive this exact string as
# spark.executor.extraClassPath and resolve it from THEIR work dir — a
# relative classes path silently vanishes there and every Scala lambda
# dies with "cannot assign SerializedLambda" on deserialization
CP="$(pwd)/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
exec java $OPENS \
  -Xmx"$XMX" -XX:+${SPARK_JVM_GC:-UseParallelGC} -XX:ActiveProcessorCount="$CPUS" \
  -Dspark.buffer.pageSize=4m -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" \
  graft.ScalingBench "$SF" "$REPL" "$SPEC" "$REPS" "$TAG"
