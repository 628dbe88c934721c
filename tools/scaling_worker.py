"""One scaling measurement: kernel × master, fresh JVM.
Usage: python tools/scaling_worker.py local[8] <sf_dir|graph.parquet> pagerank
If the 2nd arg ends in .parquet it is read directly as the edge table
(the bench-scale deterministic power-law graph, identical bytes at both
parallelism levels); otherwise edges derive from the sf_dir tables.
Prints one JSON line."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

master, sf_dir, kernel = sys.argv[1], sys.argv[2], sys.argv[3]
variant = sys.argv[4] if len(sys.argv) > 4 else None  # free-form row tag
spec = master[master.find("[") + 1 : master.find("]")]
extra = {}
if master.startswith("local-cluster"):
    execs, cores, mem = spec.split(",")
    # SAME partitioning at both cluster sizes (the job must be identical;
    # more executors = fewer task waves): fixed 32 shuffle partitions
    n = "32"
    # local-cluster's 3rd param is WORKER memory; executors still default
    # to 1g unless spark.executor.memory is set explicitly
    extra["spark.executor.memory"] = f"{int(mem) - 1024}m"
    # executor Python workers need the package (spark-submit --py-files
    # equivalent for this sandbox)
    extra["spark.executorEnv.PYTHONPATH"] = "/root/repo"
else:
    n = spec
# Optional fixed shuffle width (the local-cluster branch's rationale,
# opt-in for local[N]): kernels whose intermediate blow-up exceeds the
# edge table (linkpred's wedge expansion) need partitions sized to the
# DATA, not the core count — and a fixed width makes the task graph
# identical at both parallelism levels (more waves at fewer cores).
n = os.environ.get("SPARK_GRAFT_SHUFFLE", n)

from parrsb_spark.session import get_spark
from parrsb_spark import entry_queries as EQ

spark = get_spark(master=master, app_name=f"scaling-{kernel}-{n}", shuffle_partitions=int(n), extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
if sf_dir.endswith(".parquet"):
    edges = spark.read.parquet(sf_dir).cache()
else:
    edges = EQ.bipartite_edges(spark, sf_dir).cache()
m = edges.count()
extra_fields = {}
spark.sparkContext.setJobGroup("kernel", kernel)
t0 = time.time()
if kernel == "pagerank":
    from parrsb_spark.operators.pagerank import pagerank

    ITERS = 6
    pagerank(edges, fixed_iters=ITERS).agg({"pr": "sum"}).collect()
    work = m * ITERS
elif kernel == "cc":
    from parrsb_spark.operators.components import connected_components

    connected_components(edges).select("comp").distinct().count()
    work = m
elif kernel == "fiedler":
    from parrsb_spark.operators.fiedler import fiedler
    from parrsb_spark.config import EngineOptions

    MITER = 10
    opts = EngineOptions(rsb_max_iter=MITER, rsb_max_passes=1, rsb_tol=1e-4)
    fiedler(edges, opts=opts).count()
    work = m * MITER
    extra_fields["lanczos_iters"] = MITER
elif kernel == "rsb":
    import tempfile

    from parrsb_spark.operators.rsb import rsb_partition
    from parrsb_spark.plans.lineage import LineageLog
    from parrsb_spark.config import EngineOptions

    MITER = 10
    K = 4
    opts = EngineOptions(rsb_max_iter=MITER, rsb_max_passes=1, rsb_tol=1e-4, verbose=1)
    lin = LineageLog(spark, tempfile.mkdtemp(prefix="rsb_lineage_"))
    rsb_partition(edges, K, opts=opts, lineage=lin).groupBy("part").count().collect()
    # per-cut wall: lineage rows carry monotonic wall_s per cut record
    cuts = sorted(
        {int(r["iteration"]): float(r["wall_s"]) for r in lin.read().collect() if r["kernel"] == "rsb"}.items()
    )
    # per-phase profile (metric_rsb_print analogue): "<cut>:<phase>" → s
    phases = {}
    niters = {}
    for r in lin.read().collect():
        if "/" not in r["kernel"]:
            continue
        name = r["kernel"].split("/", 1)[1]
        key = f'{int(r["iteration"])}:{name}'
        if name == "niter":
            niters[key] = int(r["rows"] or 0)
        else:
            phases[key] = round(float(r["wall_s"]), 2)
    extra_fields["phase_walls_s"] = phases
    extra_fields["lanczos_niter"] = niters
    prev = 0.0
    extra_fields["per_cut_wall_s"] = []
    for _it, w in cuts:
        extra_fields["per_cut_wall_s"].append(round(w - prev, 2))
        prev = w
    # k=4 → 2 bisection levels, each a grouped Lanczos over every edge
    work = m * MITER * 2
elif kernel == "labelprop":
    from parrsb_spark.operators.labelprop import label_propagation

    ITERS = 5
    label_propagation(edges, n_iter=ITERS).select("label").distinct().count()
    work = m * ITERS
elif kernel == "triangles":
    from parrsb_spark.operators.triangles import triangle_total

    cp = edges if sf_dir.endswith(".parquet") else EQ.copurchase_edges(spark, sf_dir).cache()
    m = cp.count()
    triangle_total(cp)
    work = m
elif kernel == "hits":
    from parrsb_spark.operators.hits import hits

    ITERS = 4
    hits(edges, n_iter=ITERS).agg({"auth": "sum"}).collect()
    work = m * ITERS * 2  # two gather-scatters per iteration
elif kernel == "kcore":
    from parrsb_spark.operators.kcore import kcore

    # on the 16M-edge power-law graph k=24 cascades the FULL 14-round
    # peel to an empty core (numpy-probed) — the max-work variant, and
    # identical work at both parallelism widths
    kcore(edges, k=24).count()
    work = m
elif kernel == "anf":
    from parrsb_spark.operators.anf import anf_masks

    # fixed-hop bit_or merge: every hop touches all 2m sym edges with a
    # map-side-combinable reduce — identical work at both widths
    HOPS = 4
    anf_masks(edges, n_hops=HOPS, n_sketches=4).agg({"lzb_sum": "sum"}).collect()
    work = 2 * m * HOPS
elif kernel == "walks":
    from parrsb_spark.operators.walks import random_walks

    # one walk per vertex over the rank-indexed adjacency: each step
    # emits exactly one row per walker (degree probe + index join).
    # work stays 2mL — the old argmin design's unit — so rows remain
    # comparable across the design change; the indexed kernel's true
    # per-step row volume is n walkers, not 2m candidates.
    L = 4
    n_rows = random_walks(edges, walk_length=L).count()
    work = 2 * m * L
    extra_fields["corpus_rows"] = n_rows
elif kernel == "bfs":
    from parrsb_spark.operators.bfs import bfs_distances
    from parrsb_spark.sources.edges import vertices_from_edges

    # single min-vid seed; symmetrized expansion touches each edge's
    # endpoint exactly once across the whole run (every vertex enters
    # the frontier at most once), so total join work ≈ 2m sym edges
    seeds = vertices_from_edges(edges).orderBy("vid").limit(1)
    reached = bfs_distances(edges, seeds, max_hops=32).count()
    work = 2 * m
    extra_fields["reached"] = reached
elif kernel == "sssp":
    from pyspark.sql import functions as F

    from parrsb_spark.operators.sssp import sssp
    from parrsb_spark.sources.edges import vertices_from_edges

    # endpoint-derived positive weights; one min-vid seed. Weighted
    # relaxation re-improves vertices, so round count exceeds the BFS
    # hop count on the same graph — more frontier work per edge
    we = edges.withColumn("w", (F.col("src") + F.col("dst")) % 7 + 1)
    seeds = vertices_from_edges(edges).orderBy("vid").limit(1)
    settled = sssp(we, seeds, max_rounds=32).count()
    work = 2 * m
    extra_fields["settled"] = settled
elif kernel == "linkpred":
    from pyspark.sql import functions as F

    from parrsb_spark.functions.spmv import symmetrize
    from parrsb_spark.operators.linkpred import link_prediction_scores

    # df-capped candidate generation (the honest webgraph configuration
    # — see linkpred.py's cap rationale): cap=32 enumerates 169M wedges
    # on the 16M-edge graph (duckdb-probed; uncapped would be 2.2e9).
    # The work unit is the wedge count Σ_{deg(c)≤cap} C(deg,2) — the
    # rows the pair-scoring aggregate actually consumes; computed from
    # the degree table BEFORE the timer so the measured wall is the
    # kernel alone.
    CAP = 32
    d = F.col("d")
    work = int(
        symmetrize(edges)
        .groupBy("src")
        .agg(F.count("*").alias("d"))
        .filter(d <= CAP)
        .agg(F.sum(d * (d - 1) / 2))
        .collect()[0][0]
    )
    t0 = time.time()
    n_pairs = link_prediction_scores(
        edges, min_common=2, max_center_degree=CAP
    ).count()
    extra_fields["scored_pairs"] = n_pairs
    extra_fields["wedges"] = work
elif kernel == "scc":
    from pyspark.sql import functions as F

    from parrsb_spark.operators.scc import strongly_connected_components

    # random-orientation webgraph: hash-gate each undirected edge's
    # direction so the digraph has the published bowtie shape (one giant
    # SCC + DAG-ish IN/OUT shells + tendrils) instead of the copy-model
    # DAG's all-singletons. Orientation hash needs no oracle twin here
    # (bench row, not a correctness row), so plain xxhash64 is fine.
    de = edges.select(
        F.when(F.xxhash64("src", "dst") % 2 == 0, F.col("src"))
        .otherwise(F.col("dst"))
        .alias("s"),
        F.when(F.xxhash64("src", "dst") % 2 == 0, F.col("dst"))
        .otherwise(F.col("src"))
        .alias("d"),
    ).select(F.col("s").alias("src"), F.col("d").alias("dst")).cache()
    de.count()
    t0 = time.time()
    labels = strongly_connected_components(de, local_threshold=200_000)
    n_scc = labels.select("scc").distinct().count()
    # FB-Trim touches each edge a bounded number of times per phase; use
    # the BFS convention (2m) so rows are comparable to cc/bfs
    work = 2 * m
    extra_fields["n_scc"] = n_scc
elif kernel == "louvain":
    from parrsb_spark.operators.community import louvain_moves

    # 3 synchronous sweep rounds; per round one dst-keyed label attach
    # + a (src, community) count + community-degree agg + struct-max —
    # the labelprop shape plus one extra agg, so the same 2m-per-round
    # work convention
    ROUNDS = 3
    t0 = time.time()
    n_comm = louvain_moves(edges, n_rounds=ROUNDS).select("community").distinct().count()
    work = 2 * m * ROUNDS
    extra_fields["n_communities"] = n_comm
elif kernel == "mis":
    from parrsb_spark.operators.mis import mis

    # Luby rounds: per round one live-edge join + one combinable
    # min(struct) + membership anti-joins; the live set shrinks fast,
    # so the round-1 full-edge pass dominates — work = m x rounds run
    ROUNDS = 8
    t0 = time.time()
    out = mis(edges, max_rounds=ROUNDS)
    agg = out.selectExpr(
        "max(round) AS r", "sum(in_mis) AS n_in", "sum(if(in_mis=-1,1,0)) AS und"
    ).collect()[0]
    rounds_run = max(1, int(agg["r"] or 1))
    work = m * rounds_run
    extra_fields["mis_rounds"] = rounds_run
    extra_fields["mis_size"] = int(agg["n_in"] or 0)
    extra_fields["mis_undecided"] = int(agg["und"] or 0)
elif kernel == "matching":
    from parrsb_spark.operators.matching import maximal_matching

    # Israeli-Itai handshake with per-round re-randomized priorities:
    # per round one 2-role explode + one combinable min(struct) + the
    # handshake equality joins over the shrinking live set
    ROUNDS = 8
    t0 = time.time()
    out = maximal_matching(edges, max_rounds=ROUNDS)
    agg = out.selectExpr("max(round) AS r", "count(*) AS pairs").collect()[0]
    rounds_run = max(1, int(agg["r"] or 1))
    work = m * rounds_run
    extra_fields["matching_rounds"] = rounds_run
    extra_fields["matching_pairs"] = int(agg["pairs"] or 0)
elif kernel == "coloring":
    from parrsb_spark.operators.coloring import greedy_coloring

    # speculative conflict-retry schedule at a FIXED round bound (the
    # any-round-bound contract makes the partial result well-defined);
    # per round: committed-color join + hub-safe mex + conflict min
    ROUNDS = 6
    t0 = time.time()
    out = greedy_coloring(edges, max_rounds=ROUNDS)
    agg = out.selectExpr(
        "max(color) AS c", "sum(if(color=-1,1,0)) AS und", "count(*) AS n"
    ).collect()[0]
    work = m * ROUNDS
    extra_fields["coloring_rounds"] = ROUNDS
    extra_fields["coloring_max_color"] = int(agg["c"] or 0)
    extra_fields["coloring_uncolored"] = int(agg["und"] or 0)
elif kernel == "katz":
    from parrsb_spark.operators.katz import katz_centrality

    # truncated-polynomial Katz: pagerank's plan shape with exact
    # decimal walk counts — one gather + one keyed state join per round
    ROUNDS = 6
    t0 = time.time()
    agg = katz_centrality(edges, alpha=0.01, rounds=ROUNDS).selectExpr(
        "sum(katz) AS s"
    ).collect()[0]
    work = m * ROUNDS
    extra_fields["katz_rounds"] = ROUNDS
    extra_fields["katz_sum"] = float(agg["s"] or 0.0)
elif kernel == "coreness":
    from parrsb_spark.operators.coreness import coreness

    # h-index iteration at a fixed bound: per round one estimate
    # attach + distinct-value count + the per-vid window over value
    # rows + the min update — estimates only decrease
    ROUNDS = 6
    t0 = time.time()
    out = coreness(edges, max_rounds=ROUNDS)
    agg = out.selectExpr("max(core) AS mx", "count(*) AS n").collect()[0]
    work = m * ROUNDS
    extra_fields["coreness_rounds"] = ROUNDS
    extra_fields["coreness_max"] = int(agg["mx"] or 0)
elif kernel == "betweenness":
    from parrsb_spark.operators.betweenness import betweenness
    from parrsb_spark.sources.edges import vertices_from_edges

    # k-source Brandes: forward sigma levels + backward ordered-fold
    # delta levels, all sources simultaneous — work = m x sources x 2
    # passes (each pass touches each edge once per source in the
    # frontier union)
    K_SRC, HOPS = 4, 6
    srcs = vertices_from_edges(edges).orderBy("vid").limit(K_SRC)
    t0 = time.time()
    out = betweenness(edges, srcs, max_hops=HOPS)
    agg = out.selectExpr("sum(bc) AS s", "count(*) AS n").collect()[0]
    work = m * K_SRC * 2
    extra_fields["bc_sources"] = K_SRC
    extra_fields["bc_sum"] = round(float(agg["s"] or 0.0), 3)
elif kernel == "truss":
    from parrsb_spark.operators.truss import truss

    # 6-truss with a 2-round cap: each round is one degree-oriented
    # triangle enumeration + a pair-keyed count over the shrinking
    # survivor set, plus the final support pass — 3 enumerations total
    # (ROUNDS + 1), so work is the triangles convention x3
    K, ROUNDS = 6, 2
    t0 = time.time()
    n_alive = truss(edges, k=K, max_rounds=ROUNDS).count()
    work = m * (ROUNDS + 1)
    extra_fields["truss_edges"] = n_alive
elif kernel == "extract":
    # compute-bound Arrow-UDF pipeline: synth pages -> extract links ->
    # edges + dense ids (no iterative shuffles; scales with cores)
    from parrsb_spark.sources.pages import synth_pages
    from parrsb_spark.sources.edges import edges_from_pages

    N_PAGES = 120_000
    pages = synth_pages(spark, N_PAGES, m=8, seed=42, partitions=64)
    e2, _ = edges_from_pages(pages)
    m = e2.count()
    work = m
else:
    raise SystemExit(f"unknown kernel {kernel}")
wall = time.time() - t0
try:
    jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup("kernel"))
except Exception:
    jobs = None
spark.stop()
out = {
    "kernel": kernel,
    "master": master,
    "wall_s": round(wall, 2),
    "edges": m,
    "edges_per_sec": round(work / wall, 1),
    "spark_jobs": jobs,
}
out.update(extra_fields)
if variant:
    out["variant"] = variant
print(json.dumps(out))
