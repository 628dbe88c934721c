"""PageRank — damped power iteration as a join-driven SpMV loop.

Semantics (classic, matching the SQL oracle exactly):
    pr_0(v)   = 1/N
    pr_t+1(v) = (1-d)/N + d * [ Σ_{u→v} pr_t(u)/outdeg(u)  +  dangling_t/N ]
with dangling_t = Σ_{outdeg(u)=0} pr_t(u) redistributed uniformly.

Dataflow per iteration (ONE gather-scatter, SURVEY.md §2 B5):
    state ⋈ edges on src → groupBy(dst).sum → join back to state.
Scale design:
- `edges` is the loop-invariant side: hash-partitioned on src once and
  cached; the per-iteration join then only exchanges the (small) state.
- dangling mass + L1 delta come back as ONE driver scalar per iteration
  (the comm_allreduce analogue, ref /root/reference/src/fiedler.c:13-18).
- eager localCheckpoint every iteration truncates the logical plan
  (mandatory in iterative Spark, SURVEY.md §7).
- hub skew: AQE skew-join splits oversized src partitions; the groupBy
  is already map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parrsb_spark.sources.edges import vertices_from_edges


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 40,
    tol: float = 1e-8,
    fixed_iters: int | None = None,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """Returns (vid, pr). `fixed_iters` runs exactly that many iterations
    with no convergence action (oracle-parity mode); otherwise iterate to
    L1 delta < tol or max_iter."""
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.select("src", "dst").repartition(n_shuffle, "src").cache()
    verts = (vertices or vertices_from_edges(e)).select("vid")
    outdeg = e.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("outdeg"))
    # state carries outdeg so the loop never re-joins the degree table
    state = (
        verts.join(outdeg, "vid", "left")
        .select("vid", F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
        .repartition(n_shuffle, "vid")
        .cache()
    )
    n = state.count()
    if n == 0:
        return state.select("vid", F.lit(0.0).alias("pr"))

    ranks = state.withColumn("pr", F.lit(1.0 / n))
    iters = fixed_iters if fixed_iters is not None else max_iter
    for it in range(iters):
        # one scalar round-trip: dangling mass (+ optional delta later)
        dangling = (
            ranks.filter(F.col("outdeg") == 0).agg(F.sum("pr")).collect()[0][0] or 0.0
        )
        contribs = (
            e.join(
                ranks.filter(F.col("outdeg") > 0).select(
                    F.col("vid").alias("src"), (F.col("pr") / F.col("outdeg")).alias("c")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("c").alias("gathered"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            ranks.join(contribs, "vid", "left")
            .select(
                "vid",
                "outdeg",
                (F.lit(base) + F.lit(damping) * F.coalesce("gathered", F.lit(0.0))).alias("pr"),
                F.col("pr").alias("_old"),
            )
        )
        # eager per-iteration checkpoint in BOTH modes: the next iteration's
        # dangling-mass collect would otherwise recompute the whole uncached
        # lineage (O(iters²) total work) and the plan tree would keep growing
        new_ranks = new_ranks.localCheckpoint(eager=(fixed_iters is None))
        if fixed_iters is None:
            delta = new_ranks.agg(F.sum(F.abs(F.col("pr") - F.col("_old")))).collect()[0][0]
            ranks = new_ranks.drop("_old")
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks.drop("_old")
    return ranks.select("vid", "pr")
