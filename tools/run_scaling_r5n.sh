#!/bin/bash
# Round-5m below-the-knee pairs for the three coarsening/scheduling
# kernels added this round: Luby MIS, Israeli-Itai maximal matching,
# and speculative greedy coloring.
#
# Protocol identical to run_scaling_r5.sh (BASELINE.md "Sandbox
# scaling-evidence protocol"): local[2] -> local[8] below the
# one-socket saturation knee, fresh JVM per row,
# shuffle.partitions = cores, the SAME deterministic graph bytes at
# both widths. A pagerank pair rides along as the cross-session anchor.
set -u
BENCH_DIR=/root/repo/.bench
G16=$BENCH_DIR/powerlaw_1m.parquet
OUT=$BENCH_DIR/scaling_r5n.jsonl
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
grep '^cpu ' /proc/stat >&2
run coreness 'local[2]' "$G16" r5n_lowpar
run coreness 'local[8]' "$G16" r5n_lowpar
run betweenness 'local[2]' "$G16" r5n_lowpar
run betweenness 'local[8]' "$G16" r5n_lowpar
run pagerank 'local[2]' "$G16" r5n_anchor
run pagerank 'local[8]' "$G16" r5n_anchor
grep '^cpu ' /proc/stat >&2
echo "SWEEP DONE $(date -u +%H:%M:%S)" >&2
