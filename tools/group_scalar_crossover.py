"""Measure the literal-map vs broadcast-join crossover for per-group
scalars (EngineOptions.group_scalar_broadcast_threshold).

Protocol: for increasing group counts G, time ONE full iteration-shaped
cycle — build the update plan (4 per-group scalars entering a select over
a G-group vertex state) and execute it to a count — under both physical
forms. The literal-map cost is plan-side (expression tree ∝ G, Catalyst
compile + codegen); the broadcast form pays one tiny exchange instead.

Usage: python tools/group_scalar_crossover.py [--max-exp 14]
Appends one JSON line per (G, mode) to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from parrsb_spark.operators.fiedler import _attach_group_scalars
from parrsb_spark.session import get_spark


def one_cycle(df, scalars, threshold):
    t0 = time.time()
    st, sc = _attach_group_scalars(
        df, scalars={k: v for k, v in scalars.items()}, threshold=threshold
    )
    out = st.select(
        "vid",
        "grp",
        ((F.col("u") - sc["alpha"] * F.col("u")) / sc["beta"] - sc["mu"]).alias("u"),
        (F.col("u") / sc["beta"]).alias("qprev"),
    )
    n = out.agg(F.sum("u")).collect()[0][0]
    return time.time() - t0, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-exp", type=int, default=14)
    ap.add_argument("--rows-per-group", type=int, default=64)
    args = ap.parse_args()
    spark = get_spark(master="local[8]", app_name="group-scalar-crossover", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    for exp in range(6, args.max_exp + 1):
        G = 1 << exp
        df = (
            spark.range(G * args.rows_per_group)
            .select(
                F.col("id").alias("vid"),
                (F.col("id") % G).alias("grp"),
                (F.col("id") % 97 / 97.0).alias("u"),
            )
            .localCheckpoint(eager=True)
        )
        scalars = {
            name: {g: (g % 13 + 1) / 13.0 for g in range(G)}
            for name in ("alpha", "beta", "mu")
        }
        for mode, thr in (("literal", G + 1), ("broadcast", 0)):
            # warm + 3 measured cycles (a Lanczos iteration rebuilds the
            # plan with NEW scalar values each time — the cost under test)
            one_cycle(df, scalars, thr)
            walls = []
            for _ in range(3):
                w, _n = one_cycle(df, scalars, thr)
                walls.append(w)
            print(
                json.dumps(
                    {"groups": G, "mode": mode, "best_cycle_s": round(min(walls), 3),
                     "cycles_s": [round(w, 3) for w in walls]}
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
