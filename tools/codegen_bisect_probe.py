"""Bisect which loop feature defeats the codegen cache in the real
Lanczos iteration.

Levels add fidelity one feature at a time; each runs 6 iterations and
prints per-iteration compile deltas. A level whose steady-state delta is
0 caches; the first level with a nonzero steady-state delta names the
culprit.

Usage: python tools/codegen_bisect_probe.py [literal|broadcast]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parrsb_spark.operators.fiedler import _attach_group_scalars
from parrsb_spark.session import get_spark


def n_compiles(sc):
    obj = getattr(sc._jvm.org.apache.spark.metrics.source, "CodegenMetrics$")
    return getattr(obj, "MODULE$").METRIC_COMPILATION_TIME().getCount()


def run_level(spark, name, thr, *, spmv=False, qs=False, lazy_ckpt=False):
    sc = spark.sparkContext
    base = spark.range(0, 1000).select(
        F.col("id").alias("vid"), (F.col("id") % 2).alias("grp"),
        (F.rand(7) - 0.5).alias("u"), F.lit(0.0).alias("qprev"))
    if qs:
        base = base.withColumn("qs", F.array(F.col("u")))
    state = base.localCheckpoint(eager=True)
    edges = (
        spark.range(0, 5000)
        .select((F.col("id") % 1000).alias("src"),
                ((F.col("id") * 7 + 3) % 1000).alias("dst"),
                (F.col("id") % 2).alias("grp"))
        .localCheckpoint(eager=True)
        .cache()
    )
    edges.count()
    deltas = []
    vals = [(0.1 * (i + 1), 0.05 * (i + 1)) for i in range(6)]
    for a, b in vals:
        c0 = n_compiles(sc)
        st = state
        if spmv:
            g = (
                st.select(F.col("vid").alias("src"), F.col("u").alias("_x"))
                .join(edges, "src")
                .groupBy(F.col("dst").alias("vid"), "grp")
                .agg(F.sum("_x").alias("_g"))
            )
            st = st.join(g, ["vid", "grp"], "left").withColumn(
                "_Lq", F.col("u") * 2 - F.coalesce("_g", F.lit(0.0)))
        else:
            st = st.withColumn("_Lq", F.col("u") * 2)
        st, scs = _attach_group_scalars(
            st, {"alpha": {0: a, 1: a + 0.01}, "beta": {0: b, 1: b + 0.01}},
            threshold=thr)
        new_q = F.col("u") / scs["beta"]
        cols = ["vid", "grp",
                ((F.col("_Lq") - scs["alpha"] * F.col("u")) / scs["beta"]
                 - scs["beta"] * F.col("qprev")).alias("u"),
                new_q.alias("qprev")]
        if qs:
            cols.append(F.concat(F.col("qs"), F.array(new_q)).alias("qs"))
        nxt = st.select(*cols)
        state = nxt.localCheckpoint(eager=not lazy_ckpt)
        state.groupBy("grp").agg(F.sum(F.col("u") ** 2).alias("s1")).collect()
        deltas.append(int(n_compiles(sc) - c0))
    print(json.dumps({"level": name, "thr_mode": "lit" if thr else "bc",
                      "d_compiles_per_iter": deltas}), flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "broadcast"
    thr = (1 << 30) if mode == "literal" else 0
    spark = get_spark(master="local[4]", app_name="codegen-bisect",
                      shuffle_partitions=4)
    run_level(spark, "base", thr)
    run_level(spark, "+lazy_ckpt", thr, lazy_ckpt=True)
    run_level(spark, "+qs", thr, qs=True, lazy_ckpt=True)
    run_level(spark, "+spmv", thr, spmv=True, lazy_ckpt=True)
    run_level(spark, "+spmv+qs", thr, spmv=True, qs=True, lazy_ckpt=True)
    spark.stop()


if __name__ == "__main__":
    main()
