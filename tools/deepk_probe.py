"""Deep-k RSB probe: k=1024 on a 262k-vertex/2.1M-edge power-law graph.

Usage: python tools/deepk_probe.py <group_scalar_broadcast_threshold>
  (2048 = literal-map path for all 10 cuts; 64 = broadcast path forced
  from cut 6 onward). Prints one JSON line with total wall, per-cut
  fiedler walls, and the part-size min/max. Results recorded in
  BENCH_SCALING.jsonl (variants deepk_scalar_paths /
  deepk_batched_lineage) and BASELINE.md.

Exercises the literal-map -> broadcast-join group-scalar crossover
(threshold 2048 groups is NOT hit at k=1024's max 512 active groups,
so run once at default and once with threshold=64 to force the
broadcast path deep) and checks per-cut wall stays flat (no plan-size
blowup in group count).
"""
import json
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from parrsb_spark.config import EngineOptions
from parrsb_spark.operators.rsb import rsb_partition
from parrsb_spark.operators.stats import partition_sizes
from parrsb_spark.plans.lineage import LineageLog
from parrsb_spark.session import get_spark
from parrsb_spark.sources.synthgraph import materialize_parquet

thr = int(sys.argv[1])
spark = get_spark(master="local[32]", app_name=f"deepk-{thr}", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
p = materialize_parquet('/root/repo/.bench/deepk_262k.parquet', n=262_144, m=8, seed=11)
edges = spark.read.parquet(p).cache()
ne = edges.count()
opts = EngineOptions(rsb_max_iter=10, rsb_max_passes=1, rsb_tol=1e-4,
                     group_scalar_broadcast_threshold=thr)
lin = LineageLog(spark, '/tmp/deepk_lineage%d' % thr)  # rm before re-run
t0 = time.time()
parts = rsb_partition(edges, 1024, opts=opts, lineage=lin)
sizes = partition_sizes(parts).collect()
wall = time.time() - t0
ns = sorted(r["n"] for r in sizes)
lin.flush_phases()
cut_walls = {}
for r in lin.read().collect():
    if r["kernel"] == "rsb/fiedler":
        cut_walls[int(r["iteration"])] = round(float(r["wall_s"]), 1)
print(json.dumps({"k": 1024, "threshold": thr, "edges": ne,
                  "wall_s": round(wall, 1), "n_parts": len(sizes),
                  "part_min": ns[0], "part_max": ns[-1],
                  "fiedler_wall_per_cut": cut_walls}))
spark.stop()
