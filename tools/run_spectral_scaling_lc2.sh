#!/bin/bash
# Follow-up: the N=2-executor cluster-form runs completing the
# local-cluster[2,4] -> [8,4] N->4N pairs for fiedler and rsb.
set -u
GRAPH=/root/repo/.bench/powerlaw_4m.parquet
OUT=/root/repo/.bench/scaling_r4.jsonl
export SPARK_GRAFT_DRIVER_MEM=48g
for kernel in fiedler rsb; do
  echo "=== $kernel @ local-cluster[2,4,10240] ===" >&2
  line=$(timeout 4200 python /root/repo/tools/scaling_worker.py 'local-cluster[2,4,10240]' "$GRAPH" "$kernel" 2>/tmp/scaling_worker_err2.log | tail -1)
  [ -n "$line" ] && { echo "$line" >> "$OUT"; echo "$line"; } || echo "FAILED $kernel"
done
