#!/bin/bash
# Round-5 final-HEAD below-the-knee pair for the two north-rule kernels
# that had no scaling rows yet:
#
#   - labelprop: REWRITTEN this round (map-side-combinable struct-max
#     argmax replacing the per-vid row_number window — VERDICT r4
#     directive #1), so its scaling behavior at the new code is new
#     evidence, not a refresher.
#   - triangles: compact-forward oriented wedge join; previously only
#     bench-path timed, never paired across parallelism levels.
#
# Protocol identical to round-4c phase B (BASELINE.md "Sandbox
# scaling-evidence protocol"): local[2] -> local[8] (below the ~8-thread
# single-JVM saturation knee of this one-socket box), fresh JVM per row,
# shuffle.partitions = cores, deterministic 16M-edge power-law graph
# (identical bytes at both widths). A pagerank pair rides along as the
# cross-session anchor against the committed r4c rows.
set -u
BENCH_DIR=/root/repo/.bench
G16=$BENCH_DIR/powerlaw_1m.parquet
OUT=$BENCH_DIR/scaling_r5.jsonl
mkdir -p "$BENCH_DIR"
export SPARK_GRAFT_DRIVER_MEM=48g
python - <<EOF
import sys; sys.path.insert(0, '/root/repo')
from parrsb_spark.sources.synthgraph import materialize_parquet
print(materialize_parquet('$G16', n=1_000_000, m=16, seed=42))
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
# steal sample before/after (BENCH_IDLE_r04 protocol)
grep '^cpu ' /proc/stat >&2
run labelprop 'local[2]' "$G16" r5_lowpar
run labelprop 'local[8]' "$G16" r5_lowpar
run triangles 'local[2]' "$G16" r5_lowpar
run triangles 'local[8]' "$G16" r5_lowpar
run pagerank  'local[2]' "$G16" r5_anchor
run pagerank  'local[8]' "$G16" r5_anchor
grep '^cpu ' /proc/stat >&2
echo "SWEEP DONE $(date -u +%H:%M:%S)" >&2
