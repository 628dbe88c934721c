"""Decisive A/B: is the fiedler loop's ~11-recompiles-per-iteration a
codegen-cache EVICTION artifact?

Spark's generated-class cache (CodeGenerator.cache) holds
`spark.sql.codegen.cache.maxEntries` entries — DEFAULT 100. One fiedler
solve plans >100 distinct codegen units per pass, so by the time
iteration j+1 replans the same-shape job, iteration j's classes are
evicted and Janino recompiles everything, every iteration, forever.

Runs the same solve in two fresh JVMs (cache=100 vs cache=8192) and
prints compile count + wall for runs 1 and 2 in each.

Usage: python tools/codegen_cache_probe.py [sf_dir] [cpus] [iters]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from parrsb_spark import entry_queries as EQ
from parrsb_spark.config import EngineOptions
from parrsb_spark.operators.fiedler import fiedler
from parrsb_spark.session import get_spark

cache_entries = %(cache)d
spark = get_spark(master="local[%(cpus)s]", app_name="cg-cache",
                  shuffle_partitions=%(cpus)s,
                  extra_conf={"spark.sql.codegen.cache.maxEntries":
                              str(cache_entries)})
sc = spark.sparkContext
def ncomp():
    obj = getattr(sc._jvm.org.apache.spark.metrics.source, "CodegenMetrics$")
    return getattr(obj, "MODULE$").METRIC_COMPILATION_TIME().getCount()
edges = EQ.bipartite_edges(spark, %(sf_dir)r).cache()
edges.count()
opts = EngineOptions(rsb_max_iter=%(iters)d, rsb_max_passes=1, rsb_tol=1e-12)
for run in (1, 2):
    c0, t0 = ncomp(), time.time()
    fiedler(edges, opts=opts).count()
    print(json.dumps({"cache": cache_entries, "run": run,
                      "wall_s": round(time.time() - t0, 2),
                      "d_compiles": int(ncomp() - c0)}), flush=True)
spark.stop()
"""


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    for cache in (100, 8192):
        code = CHILD % {"repo": REPO, "cache": cache, "cpus": cpus,
                        "sf_dir": sf_dir, "iters": iters}
        # keep the child's (very chatty) Spark stderr out of the JSON
        # stream, but surface it on failure instead of discarding the
        # only diagnostics a missing sf dir / OOM / import error leaves
        with tempfile.NamedTemporaryFile("w+", suffix=".stderr") as errf:
            r = subprocess.run([sys.executable, "-c", code], stderr=errf)
            if r.returncode != 0:
                errf.seek(0)
                sys.stderr.write(errf.read()[-8000:])
                sys.exit(f"child (cache={cache}) exited {r.returncode}")


if __name__ == "__main__":
    main()
