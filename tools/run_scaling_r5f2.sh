#!/bin/bash
# Round-5f2: the link-prediction pair re-run with FIXED 32 shuffle
# partitions at both widths. The first sweep (scaling_r5f.jsonl) ran
# the protocol's shuffle.partitions=cores rule and local[2] DIED: the
# wedge expansion (169M rows at cap=32) is 10× the edge table, and 2
# partitions put ~85M wedge rows in one hash-aggregate task — the
# spill-aware sizing lesson, measured. Fixing the width at 32 sizes
# partitions to the DATA and makes the task graph identical at both
# core counts (more waves at fewer cores) — the same rationale the
# worker's local-cluster branch has always applied.
set -u
BENCH_DIR=/root/repo/.bench
G16=$BENCH_DIR/powerlaw_1m.parquet
OUT=$BENCH_DIR/scaling_r5f.jsonl
mkdir -p "$BENCH_DIR"
export SPARK_GRAFT_DRIVER_MEM=48g
export SPARK_GRAFT_SHUFFLE=32
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
grep '^cpu ' /proc/stat >&2
run linkpred 'local[2]' "$G16" r5f2_fixed32
run linkpred 'local[8]' "$G16" r5f2_fixed32
# anchors run with the SAME fixed width so they adjudicate this window
# against the r5e/r5f anchor history (28.2-32.0s local[8] best band)
run pagerank 'local[2]' "$G16" r5f2_anchor
run pagerank 'local[8]' "$G16" r5f2_anchor
grep '^cpu ' /proc/stat >&2
echo "SWEEP DONE $(date -u +%H:%M:%S)" >&2
