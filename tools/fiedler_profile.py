"""Per-phase / per-iteration wall profile of the bench flagship
(fiedler_1cut at sf0.1) — where do the ~40-70s go?

Times fiedler() at two iteration budgets on the SAME cached input; the
marginal wall per extra Lanczos iteration separates loop cost from
setup+recombine fixed cost. Prints one JSON line per config.

Usage: python tools/fiedler_profile.py [sf_dir] [cpus]
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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    spark = get_spark(master=f"local[{cpus}]", app_name="fiedler-profile",
                      shuffle_partitions=int(cpus))
    sc = spark.sparkContext
    edges = EQ.bipartite_edges(spark, sf_dir).cache()
    n = edges.count()
    print(f"edges={n}", file=sys.stderr)

    for iters in (5, 25):
        opts = EngineOptions(rsb_max_iter=iters, rsb_max_passes=1, rsb_tol=1e-4)
        # public-API job counting: tag the solve with a job group and ask
        # the status tracker how many jobs carried the tag (no reach into
        # DAGScheduler internals)
        group = f"fiedler-profile-{iters}"
        t0 = time.time()
        sc.setJobGroup(group, f"fiedler iters={iters}")
        try:
            fiedler(edges, opts=opts).count()
        finally:
            sc.setJobGroup("", "")
        dt = time.time() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        print(json.dumps({"iters": iters, "wall_s": round(dt, 2),
                          "jobs": jobs}))
    spark.stop()


if __name__ == "__main__":
    main()
