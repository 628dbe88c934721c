"""Is the fiedler loop recompiling generated Java every iteration?

Hypothesis (round-4 profiling): the per-group LITERAL-map scalar path
inlines fresh double constants (alpha/beta/nrm change numerically every
Lanczos iteration) into the generated whole-stage code, so every
iteration is a codegen-cache MISS and all tasks block on a Janino
recompile; the broadcast-scalars path keeps the generated source
byte-identical across iterations and hits the cache after iteration 1.

Evidence: run the same fiedler solve in ONE JVM under both scalar paths
(threshold=1<<30 forces literal, threshold=0 forces broadcast) and read
Spark's CodegenMetrics (compilation count, total compile ms, generated
source bytes) as a delta per run. Alternating A/B x2 so JVM warmup
cannot masquerade as a path effect.

Usage: python tools/fiedler_codegen_probe.py [sf_dir] [cpus] [iters]
Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parrsb_spark import entry_queries as EQ
from parrsb_spark.config import EngineOptions
from parrsb_spark.operators.fiedler import fiedler
from parrsb_spark.session import get_spark


def codegen_snapshot(sc):
    """Read cumulative CodegenMetrics from the JVM (Scala object)."""
    jvm = sc._jvm
    obj = getattr(jvm.org.apache.spark.metrics.source, "CodegenMetrics$")
    m = getattr(obj, "MODULE$")
    comp = m.METRIC_COMPILATION_TIME()
    src = m.METRIC_SOURCE_CODE_SIZE()
    return {
        "n_compiles": comp.getCount(),
        "compile_ms_total": comp.getSnapshot().getMean() * comp.getCount() / 1e6
        if hasattr(comp.getSnapshot(), "getMean")
        else None,
        "src_bytes": src.getCount(),
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    spark = get_spark(master=f"local[{cpus}]", app_name="fiedler-codegen",
                      shuffle_partitions=int(cpus))
    sc = spark.sparkContext
    edges = EQ.bipartite_edges(spark, sf_dir).cache()
    edges.count()

    runs = [("literal", 1 << 30), ("broadcast", 0)] * 2
    for name, thr in runs:
        opts = EngineOptions(rsb_max_iter=iters, rsb_max_passes=1,
                             rsb_tol=1e-12,  # don't early-exit: fixed work
                             group_scalar_broadcast_threshold=thr)
        before = codegen_snapshot(sc)
        t0 = time.time()
        fiedler(edges, opts=opts).count()
        dt = time.time() - t0
        after = codegen_snapshot(sc)
        print(json.dumps({
            "path": name, "iters": iters, "wall_s": round(dt, 2),
            "d_compiles": after["n_compiles"] - before["n_compiles"],
            "d_src_bytes": after["src_bytes"] - before["src_bytes"],
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
