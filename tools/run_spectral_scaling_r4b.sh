#!/bin/bash
# Round-4b re-measurement AFTER the cut-0 single-group fast path
# (fiedler skips the edge-tagging joins when one group covers the
# graph): same 64M-edge deterministic synthgraph, same protocol as
# run_spectral_scaling.sh, rows tagged variant=fastpath.
set -u
GRAPH=/root/repo/.bench/powerlaw_4m.parquet
OUT=/root/repo/.bench/scaling_r4b.jsonl
export SPARK_GRAFT_DRIVER_MEM=48g
python -c "
import sys; sys.path.insert(0, '/root/repo')
from parrsb_spark.sources.synthgraph import materialize_parquet
print(materialize_parquet('$GRAPH', n=4_000_000, m=16, seed=42))
"
run() {
  kernel=$1; master=$2
  echo "=== $kernel @ $master ===" >&2
  line=$(timeout 4200 python /root/repo/tools/scaling_worker.py "$master" "$GRAPH" "$kernel" fastpath 2>/tmp/scaling_worker_err.log | tail -1)
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
run rsb 'local[8]'
run rsb 'local[32]'
