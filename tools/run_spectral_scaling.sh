#!/bin/bash
# Round-4 spectral scaling sweep (VERDICT r3 directive 1): fiedler (1 cut)
# and rsb_partition(k=4) on the 64M-edge deterministic synthgraph
# (sources/synthgraph.py n=4M m=16 seed=42 — identical bytes every run).
# Two protocol forms: single-JVM thread scaling local[8] → local[32]
# (the N→4N core pair) and executor-JVM local-cluster[8,4] (the
# multi-executor form the north rule names). Each config is a fresh JVM.
set -u
GRAPH=/root/repo/.bench/powerlaw_4m.parquet
OUT=/root/repo/.bench/scaling_r4.jsonl
export SPARK_GRAFT_DRIVER_MEM=48g
run() {
  kernel=$1; master=$2
  echo "=== $kernel @ $master ===" >&2
  line=$(timeout 4200 python /root/repo/tools/scaling_worker.py "$master" "$GRAPH" "$kernel" 2>/tmp/scaling_worker_err.log | tail -1)
  if [ -n "$line" ]; then
    echo "$line" >> "$OUT"
    echo "$line"
  else
    echo "{\"kernel\": \"$kernel\", \"master\": \"$master\", \"error\": \"failed/timeout\"}" >> "$OUT"
    tail -5 /tmp/scaling_worker_err.log >&2
  fi
}
run fiedler 'local[8]'
run fiedler 'local[32]'
run fiedler 'local-cluster[8,4,10240]'
run rsb 'local[32]'
run rsb 'local-cluster[8,4,10240]'
run rsb 'local[8]'
