"""Measure the labelprop argmax fix (VERDICT r4 directive #1) on the
failure shape it exists for: a hub vertex whose neighbor-label count
rows all land on ONE window task.

Builds a deterministic star graph (one hub, H spokes, every spoke label
distinct at iteration 0 — so the (vid, label) count table has H rows for
the hub) and A/Bs the two argmax shapes over the SAME cached counts:

  window : row_number().over(Window.partitionBy(vid).orderBy(cnt desc,
           label asc)) == 1 — the pre-round-5 shape. The hub's H rows
           sort and scan inside a single task; AQE cannot split a
           window key.
  agg    : groupBy(vid).max(struct(cnt, -label)) — the shipped shape
           (operators/labelprop.py:62-66). Partial-aggregates inside
           every map task; the hub contributes ONE row per task to the
           final exchange.

Alternating A/B x reps in one JVM (the variance-immune house protocol,
BENCH_IDLE_r04 note), identical input rows, outputs asserted equal.
Prints one JSON line.

Usage: python tools/labelprop_hub_probe.py [H] [cpus] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from parrsb_spark.session import get_spark


def pick_agg(counts):
    return counts.groupBy("vid").agg(
        F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("_nl"))).alias("m")
    ).select("vid", (-F.col("m._nl")).alias("new_label"))


def pick_window(counts):
    w = Window.partitionBy("vid").orderBy(F.col("cnt").desc(), F.col("label").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vid", F.col("label").alias("new_label"))
    )


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(master=f"local[{cpus}]", app_name="labelprop-hub-probe",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    # star: spokes 2..H+1 -> hub 1. After symmetrize + one gather round,
    # the hub's neighbor labels are the H distinct spoke ids; build that
    # count table directly (cnt=1 each, distributed spark.range — no
    # driver materialization) plus one (vid=spoke, label=1) row per
    # spoke so non-hub vids exercise both paths too.
    hub_rows = spark.range(H).select(
        F.lit(1).cast("long").alias("vid"),
        (F.col("id") + 2).alias("label"),
        F.lit(1).cast("long").alias("cnt"),
    )
    spoke_rows = spark.range(H).select(
        (F.col("id") + 2).alias("vid"),
        F.lit(1).cast("long").alias("label"),
        F.lit(1).cast("long").alias("cnt"),
    )
    counts = hub_rows.union(spoke_rows).repartition(int(cpus)).cache()
    n_rows = counts.count()

    # correctness: identical picks (hub -> label 2, every spoke -> 1)
    a = pick_agg(counts)
    wdf = pick_window(counts)
    mism = a.exceptAll(wdf).count() + wdf.exceptAll(a).count()
    assert mism == 0, f"pick outputs differ: {mism} rows"

    walls = {"window": [], "agg": []}
    for _rep in range(reps):
        for name, fn in (("window", pick_window), ("agg", pick_agg)):
            t0 = time.time()
            fn(counts).agg(F.sum("new_label")).collect()
            walls[name].append(round(time.time() - t0, 2))
    spark.stop()
    out = {
        "kernel": "labelprop_hub_argmax_ab",
        "H": H,
        "count_rows": int(n_rows),
        "cpus": int(cpus),
        "wall_window_s": walls["window"],
        "wall_agg_s": walls["agg"],
        "best_window_s": min(walls["window"]),
        "best_agg_s": min(walls["agg"]),
        "speedup_best": round(min(walls["window"]) / min(walls["agg"]), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
