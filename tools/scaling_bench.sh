#!/bin/bash
# Two-cluster-size scaling evidence (north rule): same job at two
# parallelism levels, one OS process per level.
#   tools/scaling_bench.sh [sfDir] [repl] [levelN] [level4N] [reps]
# Level spec: "8" -> local[8];  "4x8x12288" -> local-cluster[4,8,12288]
# (4 forked executor JVMs x 8 cores x 12288 MB heap — the multi-heap proxy).
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
REPL=${2:-64}
SMALL=${3:-8}
BIG=${4:-32}
REPS=${5:-1}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-12g}
# cluster levels fork executors through the spark launcher:
export SPARK_HOME=${SPARK_HOME:-/opt/spark}
export SPARK_SCALA_VERSION=${SPARK_SCALA_VERSION:-2.13}
OUT=$(mktemp)
for SPEC in $SMALL $BIG; do
  if [[ "$SPEC" == *x* ]]; then
    # multi-JVM level: executors are sized by ScalingBench itself
    # (spark.executor.extraJavaOptions); the driver JVM stays unrestricted —
    # it only schedules.
    unset SPARK_JVM_CPUS
  else
    # single-JVM level: the whole JVM — GC/JIT/netty pools, not just task
    # slots — is sized to the level, like a real N-core executor (build.sbt)
    export SPARK_JVM_CPUS=$SPEC
  fi
  # per-rep/phase/cpu-accounting lines land in /tmp/scaling-level-<spec>.log
  sbt -batch "runMain graft.ScalingBench $SF $REPL $SPEC $REPS" 2>&1 \
    | tee "/tmp/scaling-level-$SPEC.log" | grep '"triples_per_sec"' | tee -a "$OUT"
done
python3 - "$OUT" <<'EOF'
import json, sys, re
lines = [json.loads(re.sub(r'^\[info\] ', '', l)) for l in open(sys.argv[1])]
small, big = lines[0], lines[1]
ratio = big["cores"] / small["cores"]
eff = big["triples_per_sec"] / (ratio * small["triples_per_sec"])
print(json.dumps({"scaling_efficiency": round(eff, 3),
                  "from": small["level"], "to": big["level"],
                  "throughput": {small["level"]: small["triples_per_sec"],
                                 big["level"]: big["triples_per_sec"]}}))
EOF
