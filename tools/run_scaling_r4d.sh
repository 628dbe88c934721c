#!/bin/bash
# Round-4d: complete the efficiency-vs-saturation curve with the
# DEEPEST below-the-knee N→4N pair this box allows — local[1] →
# local[4] on the 16M-edge graph. With the 2→8 pair at ~0.5 and the
# 8→32 pair at 0.2-0.39, a 1→4 point tests the monotonicity claim
# (BASELINE.md "Round-4c below-the-knee…"): efficiency should keep
# rising as the pair moves further below the ~8-thread single-JVM
# saturation knee, because the plans' only shared resource is memory
# bandwidth. A pure-CPU multiprocessing burner at 1→4 processes is the
# hardware control (expected ~1.0).
set -u
BENCH_DIR=/root/repo/.bench
G16=$BENCH_DIR/powerlaw_1m.parquet
OUT=$BENCH_DIR/scaling_r4d.jsonl
mkdir -p "$BENCH_DIR"
export SPARK_GRAFT_DRIVER_MEM=48g
python - <<EOF
import sys; sys.path.insert(0, '/root/repo')
from parrsb_spark.sources.synthgraph import materialize_parquet
print(materialize_parquet('$G16', n=1_000_000, m=16, seed=42))
EOF

# hardware control: same md5 burner as the round-1 protocol, 1 vs 4 procs
python - <<'EOF' >> "$OUT"
import json, time, hashlib
from multiprocessing import Pool

def burn(seed):
    h = hashlib.md5()
    for i in range(6_000_000):
        h.update(b"%d:%d" % (seed, i))
    return h.hexdigest()

rows = {}
for procs in (1, 4):
    t0 = time.time()
    with Pool(procs) as p:
        p.map(burn, range(procs * 3))  # 3 units of work per proc
    rows[procs] = time.time() - t0
eff = rows[1] / rows[4] / 1.0  # equal per-proc work => T1/T4 is the speedup per proc
print(json.dumps({"round": 4, "kernel": "burner_control", "variant": "r4d",
                  "wall_1p_s": round(rows[1], 2), "wall_4p_s": round(rows[4], 2),
                  "efficiency_1to4": round(eff, 3)}))
EOF
tail -1 "$OUT"

run() {
  kernel=$1; master=$2; tag=$3
  echo "=== $kernel @ $master ($tag) $(date -u +%H:%M:%S) ===" >&2
  line=$(timeout 4200 python /root/repo/tools/scaling_worker.py "$master" "$G16" "$kernel" "$tag" 2>/tmp/scaling_worker_err.log | tail -1)
  if [ -n "$line" ]; then
    echo "$line" >> "$OUT"; echo "$line"
  else
    echo "{\"kernel\": \"$kernel\", \"master\": \"$master\", \"variant\": \"$tag\", \"error\": \"failed/timeout\"}" >> "$OUT"
    tail -5 /tmp/scaling_worker_err.log >&2
  fi
}
# interleave levels so slow drift hits both sides equally
run pagerank 'local[1]' r4d
run pagerank 'local[4]' r4d
run fiedler  'local[1]' r4d
run fiedler  'local[4]' r4d
run cc       'local[1]' r4d
run cc       'local[4]' r4d
# second pagerank pair (it was the noisiest kernel in r4c)
run pagerank 'local[1]' r4d
run pagerank 'local[4]' r4d
echo "R4D SWEEP DONE $(date -u +%H:%M:%S)" >&2
