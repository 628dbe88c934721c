"""Benchmark harness — headline kernels at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line to stdout:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The north-rule throughput figure (PageRank edges/sec = edges × iters /
wall) and the derived-graph size are included as extra keys. The
two-parallelism scaling protocol lives in tools/scaling_bench.py
(results recorded in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parrsb_spark import entry_queries as EQ
    from parrsb_spark.config import EngineOptions
    from parrsb_spark.operators.components import connected_components
    from parrsb_spark.operators.dedup import minhash_lsh_pairs
    from parrsb_spark.operators.fiedler import fiedler
    from parrsb_spark.operators.pagerank import pagerank
    from parrsb_spark.operators.rsb import rsb_partition
    from parrsb_spark.operators.triangles import triangle_total
    from parrsb_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]", app_name="parrsb-bench", shuffle_partitions=int(cpus)
    )

    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name, fn):
        import gc

        gc.collect()  # release dropped localCheckpoint RDDs between queries
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        queries[name] = round(dt, 3)
        log(f"{name}: {dt:.2f}s")
        return out

    edges = EQ.bipartite_edges(spark, sf_dir).cache()
    n_edges = edges.count()
    extra["n_edges_bipartite"] = n_edges
    log(f"derived bipartite edges: {n_edges}")

    PR_ITERS = 10
    timed("pagerank", lambda: pagerank(edges, fixed_iters=PR_ITERS).agg({"pr": "sum"}).collect())
    extra["pagerank_edges_per_sec"] = round(n_edges * PR_ITERS / queries["pagerank"], 1)

    timed("connected_components", lambda: connected_components(edges).select("comp").distinct().count())

    cp = EQ.copurchase_edges(spark, sf_dir).cache()
    n_cp = cp.count()
    extra["n_edges_copurchase"] = n_cp
    timed("triangles", lambda: triangle_total(cp))

    opts = EngineOptions(rsb_max_iter=25, rsb_max_passes=1, rsb_tol=1e-4)
    timed("fiedler_1cut", lambda: fiedler(edges, opts=opts).count())
    extra["fiedler_edges_per_sec"] = round(n_edges / queries["fiedler_1cut"], 1)
    timed("rsb_k4", lambda: rsb_partition(edges, 4, opts=opts).groupBy("part").count().collect())

    timed("pricing_summary", lambda: EQ.q_pricing_summary(spark, sf_dir).collect())
    timed("events_window_agg", lambda: EQ.q_events_window_agg(spark, sf_dir).collect())
    timed(
        "minhash_lsh_dedup",
        lambda: minhash_lsh_pairs(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), threshold=0.5
        ).count(),
    )

    total = round(sum(queries.values()), 3)
    result = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        **extra,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
