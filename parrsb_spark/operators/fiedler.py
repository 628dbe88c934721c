"""Fiedler vector via Lanczos — the reference's flagship kernel.

Reference pipeline (ref /root/reference/src/fiedler.c):
  deterministic init (:574-578) → ortho vs ones (:20-30) → Lanczos
  tridiagonalization (:434-511, one SpMV + a few allreduces per
  iteration) → serial tridiagonal eigensolve TQLI (:328-432) → Krylov
  recombination + restart passes (:513-561).

Spark-first redesign — GROUPED Lanczos: where the reference halves the
MPI communicator and recurses (`comm_split`, ref src/rsb.c:317), we keep
ALL bisection groups in one DataFrame with a `grp` column and run one
shared Lanczos loop over the union graph. The graph Laplacian is
block-diagonal across groups (edges are intra-group), so one SpMV
gather-scatter serves every group at once; per-group scalars
(alpha/beta/residual — the comm_allreduce analogues) come back from a
single groupBy('grp') aggregation per step. Total shuffle rounds per
RSB level are therefore independent of the number of groups.

Per iteration:  1 gather-scatter (join + groupBy) + 2 scalar aggs +
1 eager localCheckpoint (plan-growth control, mandatory in iterative
Spark). Tridiagonal eigensolve = numpy on the driver (m ≤ 50, the
replicated-serial-TQLI analogue of ref fiedler.c:537).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parrsb_spark.config import EngineOptions, default_options
from parrsb_spark.functions.spmv import symmetrize
from parrsb_spark.session import iterative_conf
from parrsb_spark.sources.edges import vertices_from_edges

_EPS = 1e-30


def _scalars_df(spark, rows, schema):
    return F.broadcast(spark.createDataFrame(rows, schema=schema))


def fiedler(
    edges: DataFrame,
    membership: DataFrame | None = None,
    opts: EngineOptions | None = None,
    sign_fix: bool = True,
) -> DataFrame:
    """Returns (vid, grp, fiedler), unit-norm per group, sign-fixed so the
    entry at the group's smallest vid with |f| > 1e-9 is positive.

    `membership` = (vid, grp); default: all vertices in group 0. Edges
    crossing groups are dropped (the Laplacian of each subgraph).
    """
    opts = opts or default_options()
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))

    sym = symmetrize(edges)
    verts = vertices_from_edges(edges)
    if membership is None:
        membership = verts.withColumn("grp", F.lit(0))
    membership = membership.select("vid", F.col("grp").cast("long"))

    # intra-group symmetric edges, tagged with grp
    m_src = membership.select(F.col("vid").alias("src"), F.col("grp").alias("g1"))
    m_dst = membership.select(F.col("vid").alias("dst"), F.col("grp").alias("g2"))
    e = (
        sym.join(m_src, "src")
        .join(m_dst, "dst")
        .filter(F.col("g1") == F.col("g2"))
        .select("src", "dst", F.col("g1").alias("grp"))
        .repartition(n_shuffle, "src")
        .cache()
    )
    deg = e.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
    # isolated vertices get deg 0 (their fiedler is 0 — they carry no cut info)
    base = (
        membership.join(deg, "vid", "left")
        .select("vid", "grp", F.coalesce("deg", F.lit(0)).cast("double").alias("deg"))
        .repartition(n_shuffle, "vid")
        .cache()
    )
    sizes = {r["grp"]: r["n"] for r in base.groupBy("grp").agg(F.count("*").alias("n")).collect()}

    # ---- deterministic init (ref fiedler.c:574-578): rank within group,
    # +1000*n for the first half — a seeded, reproducible split direction.
    w_rank = Window.partitionBy("grp").orderBy("vid")
    init = base.withColumn("r", F.row_number().over(w_rank))
    n_map = _scalars_df(spark, [(int(g), int(n)) for g, n in sizes.items()], "grp long, n long")
    init = init.join(n_map, "grp").withColumn(
        "x",
        F.col("r").cast("double")
        + F.when(F.col("r") <= F.col("n") / 2, 1000.0 * F.col("n")).otherwise(0.0),
    ).select("vid", "grp", "deg", "x")

    state = _orthonormalize(init, "x", "q").withColumn("qprev", F.lit(0.0))
    f_df = None

    with iterative_conf(spark):
        for pss in range(max(1, opts.rsb_max_passes)):
            state, alphas, betas, basis = _lanczos_pass(e, state, sizes, opts)
            f_df = _recombine(spark, basis, alphas, betas, sizes)
            # residual check per group: ||L f - lambda f||
            res = _residuals(e, f_df, spark, alphas, betas, sizes)
            if all(r < opts.rsb_tol for r in res.values()):
                break
            # restart with f as the new initial vector (ref fiedler.c:529)
            state = (
                base.join(f_df.select("vid", F.col("fiedler").alias("x")), "vid", "left")
                .select("vid", "grp", "deg", F.coalesce("x", F.lit(0.0)).alias("x"))
            )
            state = _orthonormalize(state, "x", "q").withColumn("qprev", F.lit(0.0))

    out = f_df.select("vid", "grp", "fiedler")
    if sign_fix:
        w_sign = Window.partitionBy("grp").orderBy(
            (F.abs(F.col("fiedler")) < 1e-9).cast("int"), "vid"
        )
        first = out.withColumn("rn", F.row_number().over(w_sign)).filter(F.col("rn") == 1)
        signs = first.select(
            "grp", F.when(F.col("fiedler") < 0, -1.0).otherwise(1.0).alias("sgn")
        )
        out = out.join(F.broadcast(signs), "grp").select(
            "vid", "grp", (F.col("fiedler") * F.col("sgn")).alias("fiedler")
        )
    e.unpersist()
    base.unpersist()
    return out


def _orthonormalize(df: DataFrame, in_col: str, out_col: str) -> DataFrame:
    """Deflate the constant vector per group then scale to unit norm
    (ref ortho, fiedler.c:20-30; normalization :590)."""
    spark = df.sparkSession
    # one reduction: mu = Σx/n, ||x − mu||² = Σx² − n·mu²
    stats = (
        df.groupBy("grp")
        .agg(F.sum(in_col).alias("s"), F.sum(F.col(in_col) ** 2).alias("ss"), F.count("*").alias("n"))
        .collect()
    )
    rows = []
    for r in stats:
        mu = float(r["s"] / r["n"])
        nrm2 = float(r["ss"]) - r["n"] * mu * mu
        nrm = math.sqrt(nrm2) if nrm2 > _EPS else 1.0
        rows.append((int(r["grp"]), mu, nrm))
    sc = _scalars_df(spark, rows, "grp long, mu double, nrm double")
    return (
        df.join(sc, "grp")
        .withColumn(out_col, (F.col(in_col) - F.col("mu")) / F.col("nrm"))
        .drop("mu", "nrm", in_col)
    )


def _spmv(e: DataFrame, state: DataFrame, col: str) -> DataFrame:
    """One Laplacian apply: (L q)[v] = deg[v]*q[v] − Σ_{u~v} q[u].
    ONE gather-scatter — the gs_weighted analogue (ref laplacian.c:188-205)."""
    gathered = (
        e.join(state.select(F.col("vid").alias("src"), F.col(col).alias("_qv")), "src")
        .groupBy(F.col("dst").alias("vid"))
        .agg(F.sum("_qv").alias("_g"))
    )
    return (
        state.join(gathered, "vid", "left")
        .withColumn("_Lq", F.col("deg") * F.col(col) - F.coalesce("_g", F.lit(0.0)))
        .drop("_g")
    )


def _lanczos_pass(e, state, sizes, opts):
    spark = state.sparkSession
    groups = sorted(sizes)
    alphas: dict[int, list[float]] = {g: [] for g in groups}
    betas: dict[int, list[float]] = {g: [] for g in groups}
    active = {g: sizes[g] > 2 for g in groups}
    basis: list[DataFrame] = [
        state.select("vid", "grp", F.col("q").alias("qj")).withColumn("j", F.lit(0))
    ]
    miter = min(opts.rsb_max_iter, max(sizes.values()))
    state = state.localCheckpoint(eager=True)
    # NOTE: in-loop checkpoints below are LAZY — the very next groupBy
    # collect materializes them, saving one job per iteration

    for j in range(miter):
        if not any(active.values()):
            break
        beta_prev = _scalars_df(
            spark,
            [(g, betas[g][-1] if betas[g] else 0.0, active[g]) for g in groups],
            "grp long, bp double, act boolean",
        )
        st = _spmv(e, state, "q").join(beta_prev, "grp")
        st = st.withColumn("w", F.col("_Lq") - F.col("bp") * F.col("qprev")).drop("_Lq", "bp")
        # ONE reduction per iteration (the single comm_allreduce analogue):
        # alpha = <w,q>;  mu = Σw/n (ones-deflation, since Σq = 0);
        # beta² = ||w − αq − mu||² = <w,w> − α² − n·mu²  (q unit, q ⟂ 1).
        a_rows = {
            r["grp"]: r
            for r in st.groupBy("grp")
            .agg(
                F.sum(F.col("w") * F.col("q")).alias("a"),
                F.sum("w").alias("sw"),
                F.sum(F.col("w") ** 2).alias("dww"),
                F.count("*").alias("n"),
            )
            .collect()
        }
        b_rows = {}
        for g in groups:
            r = a_rows[g]
            a = float(r["a"] or 0.0)
            mu = float((r["sw"] or 0.0) / r["n"])
            dww = float(r["dww"] or 0.0)
            b2 = dww - a * a - r["n"] * mu * mu
            # the identity cancels catastrophically once the Krylov space is
            # exhausted (b² ≪ ‖w‖²): anything below √eps·‖w‖ is noise, not a
            # direction — treat as converged (the reference's tiny-beta stop)
            if b2 <= 1e-13 * max(dww, 1e-30):
                b2 = 0.0
            b_rows[g] = math.sqrt(b2) if b2 > 0 else 0.0
        for g in groups:
            if active[g]:
                alphas[g].append(float(a_rows[g]["a"] or 0.0))
        # one combined per-group scalar row: (alpha, mu, beta, act2)
        sc_rows = []
        newly_done = set()
        for g in groups:
            r = a_rows[g]
            a = float(r["a"] or 0.0)
            mu = float((r["sw"] or 0.0) / r["n"])
            b = b_rows.get(g, 0.0)
            if active[g] and b > 1e-10 and len(alphas[g]) < sizes[g]:
                betas[g].append(b)
                sc_rows.append((g, a, mu, b, True))
            else:
                if active[g]:
                    newly_done.add(g)
                sc_rows.append((g, a, mu, 1.0, False))
        sc = _scalars_df(spark, sc_rows, "grp long, alpha double, mu double, beta double, act2 boolean")
        st = st.join(sc, "grp").withColumn(
            "w2", F.col("w") - F.col("alpha") * F.col("q") - F.col("mu")
        )
        state = st.select(
            "vid",
            "grp",
            "deg",
            F.when(F.col("act2") & F.col("act"), F.col("w2") / F.col("beta")).otherwise(F.col("q")).alias("q"),
            F.when(F.col("act2") & F.col("act"), F.col("q")).otherwise(F.col("qprev")).alias("qprev"),
        ).localCheckpoint(eager=False)
        for g in newly_done:
            active[g] = False
        if any(active[g] for g in groups):
            basis.append(
                state.select("vid", "grp", F.col("q").alias("qj")).withColumn("j", F.lit(j + 1))
            )
    return state, alphas, betas, basis


def _tridiag_small_eig(alpha: list[float], beta: list[float]) -> tuple[float, np.ndarray]:
    """Smallest eigenpair of the m×m tridiagonal (driver-side numpy —
    the TQLI analogue, ref fiedler.c:328-432,537)."""
    m = len(alpha)
    if m == 0:
        return 0.0, np.zeros(0)
    T = np.diag(np.asarray(alpha, dtype=np.float64))
    for i in range(m - 1):
        T[i, i + 1] = T[i + 1, i] = beta[i]
    vals, vecs = np.linalg.eigh(T)
    return float(vals[0]), vecs[:, 0]


def _recombine(spark, basis, alphas, betas, sizes) -> DataFrame:
    """fiedler = Σ_j evec[j]·q_j per group (ref fiedler.c:513-561), then
    per-group unit normalization."""
    weights = []
    for g in sorted(sizes):
        a, b = alphas[g], betas[g][: max(0, len(alphas[g]) - 1)]
        if not a:
            weights.append((g, 0, 1.0))
            continue
        _, u = _tridiag_small_eig(a, b)
        for j, wj in enumerate(u):
            weights.append((g, j, float(wj)))
    wdf = _scalars_df(spark, weights, "grp long, j int, wj double")
    allq = basis[0]
    for q in basis[1:]:
        allq = allq.union(q)
    f = (
        allq.join(wdf, ["grp", "j"])
        .groupBy("vid", "grp")
        .agg(F.sum(F.col("qj") * F.col("wj")).alias("f_raw"))
    )
    norms = f.groupBy("grp").agg(F.sqrt(F.sum(F.col("f_raw") ** 2)).alias("nrm")).collect()
    nrm = _scalars_df(
        spark,
        [(int(r["grp"]), float(r["nrm"]) if r["nrm"] and r["nrm"] > _EPS else 1.0) for r in norms],
        "grp long, nrm double",
    )
    return (
        f.join(nrm, "grp")
        .select("vid", "grp", (F.col("f_raw") / F.col("nrm")).alias("fiedler"))
        .localCheckpoint(eager=True)
    )


def _residuals(e, f_df, spark, alphas, betas, sizes) -> dict[int, float]:
    """Per-group ||L f − λ f||₂ with λ = Rayleigh quotient fᵀLf (f unit).
    The convergence gate of ref check_rsb_partition (src/rsb.c:61-111)."""
    st = f_df.select("vid", "grp", F.col("fiedler").alias("q"))
    deg = (
        e.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
    )
    st = st.join(deg, "vid", "left").withColumn("deg", F.coalesce("deg", F.lit(0)).cast("double"))
    lf = _spmv(e, st, "q")
    rows = (
        lf.groupBy("grp")
        .agg(
            F.sum(F.col("_Lq") * F.col("q")).alias("lam"),
            F.sum(F.col("_Lq") ** 2).alias("ll"),
        )
        .collect()
    )
    out = {}
    for r in rows:
        lam = float(r["lam"] or 0.0)
        ll = float(r["ll"] or 0.0)
        # ||Lf - lam f||^2 = ll - 2 lam^2 + lam^2 = ll - lam^2  (f unit norm)
        out[int(r["grp"])] = math.sqrt(max(0.0, ll - lam * lam))
    return out
