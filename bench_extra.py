"""Extra benchmarks — per-query isolation with the noop sink (guide
§1.4) and .explain("formatted") capture. Does NOT replace bench.py
(frozen for the driver): this harness exists to isolate and attribute
time per kernel while optimizing, and to dump the physical plans the
round report cites.

Usage:
  python bench_extra.py [query ...]            # time the named kernels
  python bench_extra.py --explain DIR [q ...]  # also write DIR/<q>.txt
  env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_EXTRA_CONF
       (extra conf as "k=v,k=v"), BENCH_EXTRA_REPEAT (default 1)

Queries mirror bench.py exactly (same functions, same parameters) plus
noop-sink variants of the declared DataFrame queries.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeat = int(os.environ.get("BENCH_EXTRA_REPEAT", "1"))
    args = sys.argv[1:]
    explain_dir = None
    if args and args[0] == "--explain":
        explain_dir = args[1]
        args = args[2:]
        os.makedirs(explain_dir, exist_ok=True)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parrsb_spark import entry_queries as EQ
    from parrsb_spark.config import EngineOptions
    from parrsb_spark.operators.components import connected_components
    from parrsb_spark.operators.dedup import minhash_lsh_pairs
    from parrsb_spark.operators.fiedler import fiedler
    from parrsb_spark.operators.pagerank import pagerank
    from parrsb_spark.operators.rsb import rsb_partition
    from parrsb_spark.operators.triangles import triangle_list
    from parrsb_spark.session import get_spark

    extra_conf = {}
    for kv in os.environ.get("BENCH_EXTRA_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra_conf[k.strip()] = v.strip()

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="parrsb-bench-extra",
        shuffle_partitions=int(cpus),
        extra_conf=extra_conf,
    )

    opts = EngineOptions(rsb_max_iter=25, rsb_max_passes=1, rsb_tol=1e-4)

    def edges():
        return EQ.bipartite_edges(spark, sf_dir)

    def cp():
        return EQ.copurchase_edges(spark, sf_dir)

    # each entry: name -> (build_df_or_run, is_action)
    def q_pagerank(e):
        return pagerank(e, fixed_iters=10)

    registry = {
        "pagerank": lambda e, c: q_pagerank(e),
        "connected_components": lambda e, c: connected_components(e),
        "triangles": lambda e, c: triangle_list(c),
        "fiedler_1cut": lambda e, c: fiedler(e, opts=opts),
        "rsb_k4": lambda e, c: rsb_partition(e, 4, opts=opts),
        "pricing_summary": lambda e, c: EQ.q_pricing_summary(spark, sf_dir),
        "events_window_agg": lambda e, c: EQ.q_events_window_agg(spark, sf_dir),
        "minhash_lsh_dedup": lambda e, c: minhash_lsh_pairs(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), threshold=0.5
        ),
    }
    names = args or list(registry)

    e = edges().cache()
    e.count()
    c = cp().cache()
    c.count()

    out = {}
    for name in names:
        fn = registry[name]
        times = []
        for i in range(repeat):
            import gc

            gc.collect()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}#{i}")
            t0 = time.time()
            df = fn(e, c)
            _noop(df)
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(f"{name}: {times}", file=sys.stderr, flush=True)
        if explain_dir:
            df = fn(e, c)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(txt)
    print(json.dumps({"sf": sf_dir, "conf": extra_conf, "times": out}))
    spark.stop()


if __name__ == "__main__":
    main()
