"""Cost asymmetry of the two ANN recall knobs at bench scale.

`n_tables` re-hashes the CORPUS per table (T signature scans of the big
side + T bucket joins); `n_probes` fans out only the QUERY side (one
corpus scan, ever). This probe measures both on a deterministic
clustered corpus (2M × 64-dim by default) against brute-force ground
truth: recall@k and wall for

    tables : n_tables=T, n_probes=1
    probes : n_tables=1, n_probes=T
    base   : n_tables=1, n_probes=1

Alternating reps in one JVM (house protocol). Prints one JSON line.

Usage: python tools/ann_knob_probe.py [N] [T] [cpus] [reps] [skip_brute]
  skip_brute: any 5th arg skips the brute-force ground truth (recall
  omitted) — the cheap mode for parallelism-pair wall measurements,
  where recall is a constant of the deterministic paths anyway.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parrsb_spark.session import get_spark

DIM = 64
N_CLUSTERS = 50_000
NOISE = 0.15  # member↔member cos ≈ 0.975 → per-plane agreement ≈ 0.93,
# per-table (16 planes) ≈ 0.3: real headroom for both recall knobs while
# true top-k stays within-cluster once clusters have tens of members
K = 10
N_PLANES = 16
N_QUERIES = 64


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = sys.argv[3] if len(sys.argv) > 3 else "32"
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    skip_brute = len(sys.argv) > 5
    spark = get_spark(master=f"local[{cpus}]", app_name="ann-knob-probe",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    bcenters = spark.sparkContext.broadcast(centers)

    @F.pandas_udf("array<double>")
    def vec_udf(ids: pd.Series) -> pd.Series:
        iv = ids.to_numpy()
        # per-id deterministic noise: one generator seeded by the batch's
        # first id keeps generation vectorized AND reproducible because
        # spark.range partitions are contiguous, deterministic id spans
        g = np.random.default_rng(int(iv[0]))
        noise = g.normal(size=(len(iv), DIM))
        v = bcenters.value[iv % N_CLUSTERS] + NOISE * noise
        return pd.Series(list(v))

    corpus = (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), vec_udf("id").alias("embedding"))
        .cache()
    )
    corpus.count()

    qg = np.random.default_rng(13)
    q_centers = qg.integers(0, N_CLUSTERS, size=N_QUERIES)
    q_vecs = centers[q_centers] + NOISE * qg.normal(size=(N_QUERIES, DIM))
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in q_vecs[i]]) for i in range(N_QUERIES)],
        schema="q_id long, embedding array<double>",
    ).cache()
    queries.count()

    from parrsb_spark.operators.similarity import (
        ann_lsh_topk,
        cosine_topk,
        ivf_topk,
        ivf_train_centroids,
    )

    brute_wall = None
    exact = {}
    if not skip_brute:
        t0 = time.time()
        exact_rows = cosine_topk(corpus, queries, k=K).collect()
        brute_wall = round(time.time() - t0, 2)
        for r in exact_rows:
            exact.setdefault(r["q_id"], set()).add(r["vec_id"])

    def recall(rows):
        approx = {}
        for r in rows:
            approx.setdefault(r["q_id"], set()).add(r["vec_id"])
        return round(
            sum(len(exact[q] & approx.get(q, set())) for q in exact) / (len(exact) * K), 4
        )

    # IVF arm: train once (amortized cost, reported separately), probe 8
    # of 1024 lists -> candidate budget ~0.8% of the corpus per query
    t2 = time.time()
    cents = ivf_train_centroids(corpus, n_lists=1024, seed=5)
    ivf_train_wall = round(time.time() - t2, 2)

    arms = {
        "base": dict(n_tables=1, n_probes=1),
        "tables": dict(n_tables=t, n_probes=1),
        "probes": dict(n_tables=1, n_probes=t),
        "ivf": None,
    }
    walls = {a: [] for a in arms}
    recalls = {}
    for _rep in range(reps):
        for name, kw in arms.items():
            t1 = time.time()
            if name == "ivf":
                rows = ivf_topk(corpus, queries, k=K, n_lists=1024, n_probe=8,
                                centroids=cents).collect()
            else:
                rows = ann_lsh_topk(corpus, queries, k=K, n_planes=N_PLANES, **kw).collect()
            walls[name].append(round(time.time() - t1, 2))
            if exact:
                recalls[name] = recall(rows)
    spark.stop()
    out = {
        "kernel": "ann_knob_cost_ab",
        "N": n, "dim": DIM, "T": t, "k": K, "n_planes": N_PLANES,
        "cpus": int(cpus), "brute_wall_s": brute_wall,
        "ivf_params": {"n_lists": 1024, "n_probe": 8, "train_wall_s": ivf_train_wall},
        "recall": recalls,
        "walls_s": walls,
        "best_s": {a: min(w) for a, w in walls.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
