#!/bin/bash
# Two-cluster-size scaling evidence (north rule): same job at two
# parallelism levels, one OS process per level, with MECHANICAL clean-leg
# adjudication (tools/adjudicate_scaling.py applies the cpu-core-second
# band + GC-share criterion; dirty-window legs are flagged, never
# discarded; the headline is the median over clean pairs).
#   tools/scaling_bench.sh [sfDir] [repl] [levelN] [level4N] [reps]
# Level spec: "8" -> local[8];  "4x8x12288" -> local-cluster[4,8,12288]
# (4 forked executor JVMs x 8 cores x 12288 MB heap — the multi-heap proxy).
# NOTE: single-JVM local[32] big legs carry the one-heap GC term (share
# ~18%) and will usually be flagged gc-dirty — use cluster specs (WxCxMB)
# for north-rule evidence, as in the P28 family.
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
    | tee "/tmp/scaling-level-$SPEC.log" | grep '"clean_reps"'
  if [[ "$SPEC" == "$SMALL" && -z "${SCALING_REF_CPU:-}" ]]; then
    # calibrate the big leg's IN-RUN clean bits against the small leg's
    # reference (work is scale-invariant across levels); the authoritative
    # verdict below re-derives the band over BOTH legs' reps either way
    REF=$(grep '"clean_reps"' "/tmp/scaling-level-$SPEC.log" \
      | sed 's/^\[info\] //' \
      | python3 -c 'import json,sys; print(json.loads(sys.stdin.readlines()[-1])["ref_cpu_core_s"])')
    export SCALING_REF_CPU=$REF
  fi
done
unset SCALING_REF_CPU
python3 tools/adjudicate_scaling.py \
  "/tmp/scaling-level-$SMALL.log" "/tmp/scaling-level-$BIG.log"
