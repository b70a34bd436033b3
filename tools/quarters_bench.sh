#!/bin/bash
# The 4-concurrent-independent-JVMs multi-heap proxy (VERDICT r4 item 1):
# leg A = ONE 8-core JVM over a quarter of the amplified corpus;
# leg B = FOUR such JVMs CONCURRENTLY, each over a quarter (disjoint outputs).
# Aggregate throughput(B) / (4 x throughput(A)) isolates what 4 separate
# heaps on 4x the cores do to the per-heap GC term, with ZERO cross-JVM
# coordination (no shuffle between them — the embarrassingly-parallel
# component a real map-heavy 4N cluster approximates).
#   tools/quarters_bench.sh [sfDir] [quarterRepl] [reps]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
REPL=${2:-2048}   # 8192/4: each JVM's share of the pair-M corpus
REPS=${3:-2}
echo "QUARTERS start loadavg=$(cat /proc/loadavg)"
echo "--- leg A: one 8-core JVM, repl $REPL"
tools/scaling_java.sh "$SF" "$REPL" 8 "$REPS" qA > /tmp/quarters-A.log 2>&1
grep -E '"(rep|triples_per_sec)"' /tmp/quarters-A.log
echo "--- leg B: four concurrent 8-core JVMs, repl $REPL each"
PIDS=()
for i in 1 2 3 4; do
  tools/scaling_java.sh "$SF" "$REPL" 8 "$REPS" "qB$i" > "/tmp/quarters-B$i.log" 2>&1 &
  PIDS+=($!)
done
for p in "${PIDS[@]}"; do wait "$p"; done
for i in 1 2 3 4; do
  echo "JVM $i:"; grep -E '"(rep|triples_per_sec)"' "/tmp/quarters-B$i.log"
done
echo "QUARTERS end loadavg=$(cat /proc/loadavg)"
python3 - <<'EOF'
import json, re
def last(path):
    rows = []
    for l in open(path):
        l = re.sub(r'^\[info\] ', '', l.strip())
        if '"triples_per_sec"' in l:
            rows.append(json.loads(l))
    return rows[-1]
a = last("/tmp/quarters-A.log")
bs = [last(f"/tmp/quarters-B{i}.log") for i in (1, 2, 3, 4)]
agg = sum(b["triples_per_sec"] for b in bs)
print(json.dumps({
    "single_jvm_tps": a["triples_per_sec"],
    "per_jvm_concurrent": [b["triples_per_sec"] for b in bs],
    "aggregate_4jvm_tps": agg,
    "scaling_efficiency": round(agg / (4 * a["triples_per_sec"]), 3)}))
EOF
