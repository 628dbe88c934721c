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
- the dangling mass stays ON THE CLUSTER as a broadcast one-row
  aggregate (no driver round-trip per iteration); every iteration ends
  in a LAZY localCheckpoint, and the NEXT iteration's dangling
  broadcast job is what materializes it — so each SpMV executes exactly
  once and the logical plan stays flat. (Round 5 checkpointed only at
  `chain`-burst boundaries; inside a burst the broadcast subtree
  re-derived the previous iteration's whole gather-scatter, because
  ReuseExchange does not collapse duplicate subtrees across a broadcast
  boundary — measured ~1.5× SpMV compute per iteration. The lazy
  per-iteration checkpoint keeps burst-mode's job count at one
  materializing job per iteration with zero recompute.)
- `chain` now only sets the cadence of convergence CHECKS (the delta
  join is a full extra pass; every 2 iterations is the measured
  sweet spot), not the checkpoint cadence.
- hub skew: AQE skew-join splits oversized src partitions; the groupBy
  is already map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parrsb_spark.session import iterative_conf
from parrsb_spark.sources.edges import vertices_from_edges


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 40,
    tol: float = 1e-8,
    fixed_iters: int | None = None,
    vertices: DataFrame | None = None,
    chain: int = 2,
    opts=None,
    weight_col: str | None = None,
) -> DataFrame:
    """Returns (vid, pr). `fixed_iters` runs exactly that many iterations
    with no convergence checks (oracle-parity mode); otherwise iterate to
    L1 delta < tol or max_iter, testing convergence every `chain` steps.

    `weight_col` names an edge weight column (e.g. the link multiplicity
    of the host-level rollup, sources/edges.host_edges_from_pages):
    contributions become pr(u)·w(u,v)/wout(u) with wout = Σ out-weights.
    Unweighted (the default) is the w ≡ 1 special case and produces
    IDENTICAL values through the identical plan — outdeg below is
    sum(1) per src either way.

    Hub salting is armed BY DEFAULT: when the max in-degree exceeds
    `salt_degree_threshold` (from `opts` or the env-overridable
    defaults), the per-iteration contribution aggregation runs as the
    explicit two-stage salted form (functions/spmv.py `salted_agg`).
    Spark's map-side partial aggregation already combines hub keys per
    map task; the salted path covers the residual funnel where ONE
    reduce key still receives a partial from each of ~10⁵ map tasks.
    The in-degree probe is folded into the degree aggregation the setup
    already pays (one union-groupBy computes out- AND in-degree) — zero
    extra jobs, so it no longer hides behind an opts gate."""
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = damping

    # the weight column is carried ONLY when weighted — a materialized
    # constant would bloat the cached edge table at 10^12-edge scale
    ecols = ["src", "dst"] + (
        [F.col(weight_col).cast("long").alias("_w")] if weight_col else []
    )
    # sorted at cache time: the per-iteration co-partitioned SMJ then
    # reuses the cached ordering instead of re-sorting |E| rows per
    # iteration (InMemoryRelation preserves child outputOrdering)
    e = edges.select(*ecols).repartition(n_shuffle, "src").sortWithinPartitions("src").cache()
    out_w = F.col("_w") if weight_col else F.lit(1)
    deg = (
        e.select(F.col("src").alias("vid"), out_w.alias("_o"), F.lit(0).alias("_i"))
        .unionAll(e.select(F.col("dst").alias("vid"), F.lit(0).alias("_o"), F.lit(1).alias("_i")))
        .groupBy("vid")
        .agg(F.sum("_o").alias("outdeg"), F.sum("_i").alias("indeg"))
    )
    if vertices is None:
        # the degree aggregate's key set IS the endpoint vertex set —
        # deriving vertices separately would pay a second full 2|E|
        # distinct exchange for the identical rows (guide §2.4)
        state = deg.repartition(n_shuffle, "vid").cache()
    else:
        state = (
            vertices.select("vid")
            .join(deg, "vid", "left")
            .select(
                "vid",
                F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
                F.coalesce("indeg", F.lit(0)).alias("indeg"),
            )
            .repartition(n_shuffle, "vid")
            .cache()
        )
    srow = state.agg(
        F.count("*").alias("n"),
        F.max("outdeg").alias("mx"),
        F.max("indeg").alias("mi"),
        # |E| rides the same setup aggregate (indeg sums 1 per edge row
        # even in weighted mode) — feeds the loop-parallelism derivation
        F.sum("indeg").alias("ne"),
    ).collect()[0]
    n = srow["n"]
    if n == 0:
        return state.select("vid", F.lit(0.0).alias("pr"))
    from parrsb_spark.config import default_options as _dflt
    from parrsb_spark.session import loop_partitions

    thr = (opts or _dflt()).salt_degree_threshold
    # max IN-degree is the reduce-funnel concentration salting exists for
    use_salt = float(srow["mi"] or 0) > thr
    # measured-skew AQE gate (see session.iterative_conf): max OUT-degree
    # IS the per-src edge-row concentration the skew-JOIN split exists
    # for; below the salting threshold, loop AQE is pure re-planning
    # overhead. One agg, folded into the row count the setup already paid.
    loop_no_aqe = float(srow["mx"] or 0) <= thr
    # scale-adaptive loop parallelism (guide §2.2 — see
    # session.loop_partitions): re-key the cached edge side to it so the
    # per-iteration join stays exchange-free; a no-op when the derived
    # count equals the session conf (any cluster-sized input)
    n_loop = loop_partitions(int(srow["ne"] or 0), n_shuffle)
    if n_loop != n_shuffle:
        e2 = e.repartition(n_loop, "src").sortWithinPartitions("src").cache()
        e2.count()  # materialize from the n_shuffle cache, then free it
        e.unpersist()
        e = e2

    ranks = state.select("vid", "outdeg").withColumn("pr", F.lit(1.0 / n))

    def one_iter(r: DataFrame) -> DataFrame:
        # dangling mass as a broadcast 1-row aggregate — no driver round-trip
        dang = F.broadcast(
            r.agg(
                F.coalesce(
                    F.sum(F.when(F.col("outdeg") == 0, F.col("pr"))), F.lit(0.0)
                ).alias("_dang")
            )
        )
        joined = e.join(
            r.filter(F.col("outdeg") > 0).select(
                F.col("vid").alias("src"), (F.col("pr") / F.col("outdeg")).alias("_c")
            ),
            "src",
        ).select(
            F.col("dst").alias("vid"),
            (
                (F.col("_c") * F.col("_w")) if weight_col else F.col("_c")
            ).alias("c"),
        )
        if use_salt:
            from parrsb_spark.functions.spmv import salted_agg

            contribs = salted_agg(joined, "vid", "c", "sum", "g")
        else:
            contribs = joined.groupBy("vid").agg(F.sum("c").alias("g"))
        # same association order as the SQL oracle:
        # (0.15 + 0.85*dang)/n + 0.85*gather
        return (
            r.join(contribs, "vid", "left")
            .crossJoin(dang)
            .select(
                "vid",
                "outdeg",
                (
                    (F.lit(1.0 - d) + F.lit(d) * F.col("_dang")) / F.lit(float(n))
                    + F.lit(d) * F.coalesce("g", F.lit(0.0))
                ).alias("pr"),
            )
        )

    iters = fixed_iters if fixed_iters is not None else max_iter
    done = 0
    with iterative_conf(
        spark,
        disable_aqe=loop_no_aqe,
        no_auto_broadcast=True,
        shuffle_partitions=n_loop,
    ):
        while done < iters:
            burst = min(chain, iters - done)
            prev = ranks
            for _ in range(burst):
                # LAZY checkpoint after EVERY iteration: iteration t+1's
                # dangling-mass broadcast job is the action that
                # materializes iteration t's blocks, so each SpMV runs
                # exactly ONCE. Round 5 checkpointed only at burst ends;
                # inside a burst the broadcast subtree re-derived the
                # previous iteration's ENTIRE gather-scatter (guide §2.4
                # — ReuseExchange does not reach across the broadcast
                # boundary), i.e. ~1.5 SpMVs of compute per iteration.
                ranks = one_iter(ranks).localCheckpoint(eager=False)
            done += burst
            if fixed_iters is None:
                delta = (
                    ranks.join(prev.select("vid", F.col("pr").alias("_old")), "vid")
                    .agg(F.sum(F.abs(F.col("pr") - F.col("_old"))))
                    .collect()[0][0]
                )
                # L1 movement across the whole burst below tol ⇒ converged
                if delta is not None and delta < tol:
                    break
        # materialize the tail of the lazy chain INSIDE the loop conf
        # (fixed-iters mode otherwise defers every job to the caller's
        # first action, outside the iterative session tuning)
        ranks.count()
    return ranks.select("vid", "pr")


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    fixed_iters: int = 8,
    vertices: DataFrame | None = None,
    chain: int = 2,
) -> DataFrame:
    """Random walk with restart: the teleport vector is uniform over the
    seed set S instead of over all vertices —

        pr_0(v)   = tele(v)
        pr_t+1(v) = ((1-d) + d·dangling_t)·tele(v) + d·Σ_{u→v} pr_t(u)/od(u)

    with tele(v) = 1/|S| for v ∈ S else 0 (dangling mass restarts at the
    seeds, keeping Σpr = 1 exactly like the global kernel). Same scale
    shape as `pagerank`: loop-invariant cached edges, broadcast one-row
    dangling aggregate, `chain`-burst localCheckpoints. `seeds` is a
    (vid) DataFrame; it is broadcast onto the state ONCE at setup (seed
    sets are tiny relative to V — that is the point of personalization).

    Returns (vid, pr) after exactly `fixed_iters` iterations (oracle-
    parity mode; the entry row unrolls the same count in SQL).
    """
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = damping

    e = edges.select("src", "dst").repartition(n_shuffle, "src").sortWithinPartitions("src").cache()
    if vertices is None:
        # one union aggregate yields the vertex set AND outdeg together —
        # no separate 2|E| vertex distinct (see pagerank)
        verts_deg = (
            e.select(F.col("src").alias("vid"), F.lit(1).alias("_o"))
            .unionAll(e.select(F.col("dst").alias("vid"), F.lit(0).alias("_o")))
            .groupBy("vid")
            .agg(F.sum("_o").alias("outdeg"))
        )
    else:
        outdeg = e.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("outdeg"))
        verts_deg = (
            vertices.select("vid")
            .join(outdeg, "vid", "left")
            .select("vid", F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
        )
    n_seeds = seeds.select("vid").distinct().count()
    if n_seeds == 0:
        return verts_deg.select("vid", F.lit(0.0).alias("pr"))
    state = (
        verts_deg
        .join(
            F.broadcast(seeds.select("vid").distinct().withColumn("_s", F.lit(1))),
            "vid",
            "left",
        )
        .select(
            "vid",
            F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
            F.when(F.col("_s").isNotNull(), F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("tele"),
        )
        .repartition(n_shuffle, "vid")
        .cache()
    )
    ranks = state.withColumn("pr", F.col("tele"))

    def one_iter(r: DataFrame) -> DataFrame:
        dang = F.broadcast(
            r.agg(
                F.coalesce(
                    F.sum(F.when(F.col("outdeg") == 0, F.col("pr"))), F.lit(0.0)
                ).alias("_dang")
            )
        )
        contribs = (
            e.join(
                r.filter(F.col("outdeg") > 0).select(
                    F.col("vid").alias("src"), (F.col("pr") / F.col("outdeg")).alias("c")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("c").alias("g"))
        )
        # association order mirrors the SQL oracle:
        # ((1-d) + d*dang)*tele + d*gather
        return (
            r.join(contribs, "vid", "left")
            .crossJoin(dang)
            .select(
                "vid",
                "outdeg",
                "tele",
                (
                    (F.lit(1.0 - d) + F.lit(d) * F.col("_dang")) * F.col("tele")
                    + F.lit(d) * F.coalesce("g", F.lit(0.0))
                ).alias("pr"),
            )
        )

    done = 0
    with iterative_conf(spark, disable_aqe=True, no_auto_broadcast=True):
        while done < fixed_iters:
            burst = min(chain, fixed_iters - done)
            for _ in range(burst):
                # lazy per-iteration checkpoint — one SpMV per iteration,
                # materialized by the next iteration's dangling broadcast
                # (see `pagerank`)
                ranks = one_iter(ranks).localCheckpoint(eager=False)
            done += burst
        ranks.count()
    return ranks.select("vid", "pr")
