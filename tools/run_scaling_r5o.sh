#!/bin/bash
# Round-5o below-the-knee pair for the truncated-polynomial Katz
# kernel; protocol identical to run_scaling_r5.sh (BASELINE.md
# "Sandbox scaling-evidence protocol"): local[2] -> local[8] below the
# one-socket knee, fresh JVM per row, shuffle.partitions = cores, the
# SAME deterministic graph bytes at both widths.
set -u
BENCH_DIR=/root/repo/.bench
G16=$BENCH_DIR/powerlaw_1m.parquet
OUT=$BENCH_DIR/scaling_r5o.jsonl
export SPARK_GRAFT_DRIVER_MEM=48g
run() {
  kernel=$1; master=$2; graph=$3; tag=$4
  echo "=== $kernel @ $master ($tag) $(date -u +%H:%M:%S) ===" >&2
  line=$(timeout 4200 python /root/repo/tools/scaling_worker.py "$master" "$graph" "$kernel" "$tag" 2>/tmp/scaling_worker_err.log | tail -1)
  if [ -n "$line" ]; then
    echo "$line" >> "$OUT"; echo "$line"
  else
    echo "{\"kernel\": \"$kernel\", \"master\": \"$master\", \"variant\": \"$tag\", \"error\": \"failed/timeout\"}" >> "$OUT"
    tail -5 /tmp/scaling_worker_err.log >&2
  fi
}
grep '^cpu ' /proc/stat >&2
run katz 'local[2]' "$G16" r5o_lowpar
run katz 'local[8]' "$G16" r5o_lowpar
grep '^cpu ' /proc/stat >&2
echo "SWEEP DONE $(date -u +%H:%M:%S)" >&2
