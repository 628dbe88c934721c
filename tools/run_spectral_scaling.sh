#!/bin/bash
# Round-4 spectral scaling sweep (VERDICT r3 directive 1): fiedler (1 cut)
# and rsb_partition(k=4) on the 64M-edge deterministic synthgraph at both
# protocol forms (single-JVM local[8/32]; executor-JVM local-cluster[2,4]/[8,4]).
set -u
GRAPH=/root/repo/.bench/powerlaw_4m.parquet
OUT=/root/repo/.bench/scaling_r4.jsonl
export SPARK_GRAFT_DRIVER_MEM=40g
for kernel in fiedler rsb; do
  for master in 'local[8]' 'local[32]' 'local-cluster[2,4,10240]' 'local-cluster[8,4,10240]'; do
    echo "=== $kernel @ $master ===" >&2
    line=$(timeout 3600 python /root/repo/tools/scaling_worker.py "$master" "$GRAPH" "$kernel" 2>/tmp/scaling_worker_err.log | tail -1)
    if [ -n "$line" ]; then
      echo "$line" >> "$OUT"
      echo "$line"
    else
      echo "{\"kernel\": \"$kernel\", \"master\": \"$master\", \"error\": \"failed/timeout\"}" >> "$OUT"
      tail -5 /tmp/scaling_worker_err.log >&2
    fi
  done
done
