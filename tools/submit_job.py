"""Cluster job entrypoint — the `spark-submit --py-files` launch path.

North-rule launch contract: the engine runs on a multi-executor cluster
via spark-submit, with the package shipped as a zip (the reference's
analogue is its MPI launcher, ref /root/reference/examples/genmap.c).

    python -m zipfile -c /tmp/parrsb_spark.zip parrsb_spark
    spark-submit --master <cluster> --py-files /tmp/parrsb_spark.zip \
        tools/submit_job.py pagerank --input edges.parquet \
        --iters 10 --output /out/pr

The session comes from spark-submit's conf (no master override here);
kernels read/write parquet (Iceberg-pluggable via sources/io.py) and
print ONE JSON summary line. `--ckpt-dir` arms the durable
checkpoint/resume path (plans/lineage.py): re-submitting the identical
command after a kill resumes mid-run.

Kernels: pagerank | cc | labelprop | triangles | fiedler | rsb.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser(description="parrsb_spark cluster job")
    ap.add_argument("kernel", choices=["pagerank", "cc", "labelprop", "triangles", "fiedler", "rsb"])
    ap.add_argument("--input", required=True, help="edge table parquet (src,dst)")
    ap.add_argument("--output", required=True, help="output parquet dir")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--k", type=int, default=4, help="rsb: number of parts")
    ap.add_argument("--ckpt-dir", default=None, help="durable checkpoint/resume root")
    ap.add_argument("--profile", action="store_true", help="print the per-phase timer report (rsb)")
    args = ap.parse_args()

    # session owned by spark-submit: master/executors/memory come from the
    # submit command line, not from code (get_spark would force a master)
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"parrsb-{args.kernel}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    edges = spark.read.parquet(args.input)
    t0 = time.time()
    lineage = None
    if args.kernel == "pagerank":
        if args.ckpt_dir:
            from parrsb_spark.plans.lineage import pagerank_resumable

            out = pagerank_resumable(spark, edges, args.ckpt_dir, total_iters=args.iters)
        else:
            from parrsb_spark.operators.pagerank import pagerank

            out = pagerank(edges, fixed_iters=args.iters)
    elif args.kernel == "cc":
        from parrsb_spark.operators.components import connected_components

        out = connected_components(edges)
    elif args.kernel == "labelprop":
        from parrsb_spark.operators.labelprop import label_propagation

        out = label_propagation(edges, n_iter=args.iters)
    elif args.kernel == "triangles":
        from parrsb_spark.operators.triangles import triangle_counts

        out = triangle_counts(edges)
    elif args.kernel == "fiedler":
        from parrsb_spark.config import EngineOptions
        from parrsb_spark.operators.fiedler import fiedler

        out = fiedler(edges, opts=EngineOptions(rsb_max_iter=args.iters, rsb_max_passes=1))
    else:  # rsb
        from parrsb_spark.config import EngineOptions
        from parrsb_spark.operators.rsb import rsb_partition, rsb_resumable

        opts = EngineOptions(rsb_max_iter=args.iters, rsb_max_passes=1)
        if args.profile or args.ckpt_dir:
            from parrsb_spark.plans.lineage import LineageLog

            lineage = LineageLog(spark, args.ckpt_dir or (args.output + "_lineage"))
        if args.ckpt_dir:
            out = rsb_resumable(edges, args.k, args.ckpt_dir, opts=opts, lineage=lineage)
        else:
            out = rsb_partition(edges, args.k, opts=opts, lineage=lineage)

    out.write.mode("overwrite").parquet(args.output)
    rows = spark.read.parquet(args.output).count()
    summary = {
        "kernel": args.kernel,
        "rows": rows,
        "wall_s": round(time.time() - t0, 2),
        "output": args.output,
    }
    print(json.dumps(summary))
    if args.profile and lineage is not None:
        from parrsb_spark.plans.lineage import format_phase_report

        print(format_phase_report(lineage.read()))
    spark.stop()


if __name__ == "__main__":
    main()
