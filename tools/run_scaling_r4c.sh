#!/bin/bash
# Round-4c sweep, two phases on a freshly-rebooted idle box:
#
# Phase B ("lowpar"): the north-rule N→4N pair measured at local[2] →
#   local[8] on a 16M-edge graph — BELOW the single-JVM saturation knee
#   (~8 threads; BASELINE.md "Sandbox scaling-evidence protocol"). The
#   8→32 pair is memory-bus-bound on this box; 2→8 shows whether the
#   ENGINE's plans scale when the hardware underneath them does.
#
# Phase A ("fastpath"): re-measure the 64M-edge spectral flagship after
#   the cut-0 single-group fast path (commit 7f1af31) — same graph,
#   protocol, and masters as the round-4 sweep it refreshes.
set -u
BENCH_DIR=/root/repo/.bench
G64=$BENCH_DIR/powerlaw_4m.parquet
G16=$BENCH_DIR/powerlaw_1m.parquet
OUT=$BENCH_DIR/scaling_r4c.jsonl
mkdir -p "$BENCH_DIR"
export SPARK_GRAFT_DRIVER_MEM=48g
python - <<EOF
import sys; sys.path.insert(0, '/root/repo')
from parrsb_spark.sources.synthgraph import materialize_parquet
print(materialize_parquet('$G16', n=1_000_000, m=16, seed=42))
print(materialize_parquet('$G64', n=4_000_000, m=16, seed=42))
EOF
run() {
  kernel=$1; master=$2; graph=$3; tag=$4
  echo "=== $kernel @ $master ($tag) $(date -u +%H:%M:%S) ===" >&2
  line=$(timeout 4200 python /root/repo/tools/scaling_worker.py "$master" "$graph" "$kernel" "$tag" 2>/tmp/scaling_worker_err.log | tail -1)
  if [ -n "$line" ]; then
    echo "$line" >> "$OUT"
    echo "$line"
  else
    echo "{\"kernel\": \"$kernel\", \"master\": \"$master\", \"variant\": \"$tag\", \"error\": \"failed/timeout\"}" >> "$OUT"
    tail -5 /tmp/scaling_worker_err.log >&2
  fi
}
# Phase B: below-the-knee N→4N (2→8 cores), 16M edges
run pagerank 'local[2]' "$G16" lowpar
run pagerank 'local[8]' "$G16" lowpar
run fiedler  'local[2]' "$G16" lowpar
run fiedler  'local[8]' "$G16" lowpar
run cc       'local[2]' "$G16" lowpar
run cc       'local[8]' "$G16" lowpar
# Phase A: 64M-edge spectral flagship, post-fast-path
run fiedler 'local[8]'  "$G64" fastpath
run fiedler 'local[32]' "$G64" fastpath
run rsb     'local[8]'  "$G64" fastpath
run rsb     'local[32]' "$G64" fastpath
echo "SWEEP DONE $(date -u +%H:%M:%S)" >&2
