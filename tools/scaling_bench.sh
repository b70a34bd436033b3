#!/bin/bash
# Two-cluster-size scaling evidence (north rule): same job, local[N] vs
# local[4N], one JVM per level. Usage: tools/scaling_bench.sh [sfDir] [repl] [N] [4N]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
REPL=${2:-64}
SMALL=${3:-8}
BIG=${4:-32}
REPS=${5:-1}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-12g}
OUT=$(mktemp)
for CPUS in $SMALL $BIG; do
  # the whole JVM — GC/JIT/netty pools, not just task slots — is sized to
  # the level, like a real N-core executor (see build.sbt)
  # per-rep/phase/cpu-accounting lines land in /tmp/scaling-level-<N>.log
  SPARK_JVM_CPUS=$CPUS sbt -batch "runMain graft.ScalingBench $SF $REPL $CPUS $REPS" 2>&1 \
    | tee "/tmp/scaling-level-$CPUS.log" | grep '"triples_per_sec"' | tee -a "$OUT"
done
python3 - "$OUT" "$SMALL" "$BIG" <<'EOF'
import json, sys, re
lines = [json.loads(re.sub(r'^\[info\] ', '', l)) for l in open(sys.argv[1])]
small, big = int(sys.argv[2]), int(sys.argv[3])
tp = {l["level"]: l["triples_per_sec"] for l in lines}
eff = tp[f"local[{big}]"] / ((big / small) * tp[f"local[{small}]"])
print(json.dumps({"scaling_efficiency": round(eff, 3),
                  "from": f"local[{small}]", "to": f"local[{big}]",
                  "throughput": tp}))
EOF
