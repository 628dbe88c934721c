"""M1/M3: Fiedler vector, RSB/RCB/RIB partitioning, quality gates."""

import math

import pytest
from pyspark.sql import functions as F

from parrsb_spark import graphs
from parrsb_spark.config import EngineOptions
from parrsb_spark.operators.contraction import contract_aliases
from parrsb_spark.operators.fiedler import fiedler
from parrsb_spark.operators.rcb import rcb_partition
from parrsb_spark.operators.rib import rib_partition
from parrsb_spark.operators.rsb import rsb_partition
from parrsb_spark.operators.stats import edge_cut, partition_sizes, quality_gate
from tests.oracles import components_np, fiedler_np


def _opts(**kw):
    base = dict(rsb_max_iter=40, rsb_max_passes=5, rsb_tol=1e-8)
    base.update(kw)
    return EngineOptions(**base)


@pytest.mark.parametrize(
    "name,edges",
    [
        ("grid4x3", graphs.grid2d(4, 3)[0]),
        ("two_cliques", graphs.two_cliques_bridge(8)),
        ("path", [(i, i + 1) for i in range(1, 12)]),
    ],
)
def test_fiedler_allclose_1e6(spark, name, edges):
    """FIXTURES.md §4: fiedler allclose 1e-6 after sign orientation.
    Graphs chosen with simple (non-degenerate) λ₂."""
    df = graphs.to_df(spark, edges)
    got = {r["vid"]: r["fiedler"] for r in fiedler(df, opts=_opts()).collect()}
    exp, lam2 = fiedler_np(edges)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-6, (name, v, got[v], exp[v])


@pytest.mark.parametrize("impl", ["block", "csr_arrow"])
def test_fiedler_spmv_impls_allclose(spark, impl):
    """D3/D5 cross-validation (the reference's dual-impl pattern,
    mat_vec_csr vs gs form): every physical SpMV strategy must reproduce
    the numpy eigenvector to 1e-6."""
    edges = graphs.grid2d(4, 3)[0]
    df = graphs.to_df(spark, edges)
    got = {
        r["vid"]: r["fiedler"]
        for r in fiedler(df, opts=_opts(spmv_impl=impl)).collect()
    }
    exp, _ = fiedler_np(edges)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-6, (impl, v)


@pytest.mark.parametrize(
    "name,edges",
    [
        ("grid4x3", graphs.grid2d(4, 3)[0]),
        ("two_cliques", graphs.two_cliques_bridge(8)),
        ("path", [(i, i + 1) for i in range(1, 12)]),
    ],
)
def test_fiedler_inverse_allclose_1e6(spark, name, edges):
    """D9-D11: rsb_algo='inverse' (inverse power + MG-preconditioned
    projected CG, ref src/fiedler.c:189-321) must reach the same
    eigenvector as the numpy oracle to 1e-6."""
    df = graphs.to_df(spark, edges)
    opts = _opts(rsb_max_iter=40, rsb_max_passes=50, rsb_tol=1e-9, rsb_algo="inverse")
    got = {r["vid"]: r["fiedler"] for r in fiedler(df, opts=opts).collect()}
    exp, _ = fiedler_np(edges)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-6, (name, v, got[v], exp[v])


def test_mg_vcycle_distributed_matches_numpy(spark):
    """D10/D11: the distributed V-cycle (2 DataFrame levels + numpy tail)
    must reproduce the all-numpy V-cycle bit-for-bit on the same input."""
    import numpy as np

    from parrsb_spark.operators.multigrid import (
        _np_tail_levels,
        _np_vcycle,
        mg_setup,
        mg_vcycle,
    )

    n = 12
    edges = [(i, i + 1) for i in range(1, n)]
    A = np.zeros((n, n))
    for u, v in edges:
        A[u-1, u-1] += 1; A[v-1, v-1] += 1; A[u-1, v-1] -= 1; A[v-1, u-1] -= 1
    off = spark.createDataFrame(
        [(0, u, v, -1.0) for u, v in edges] + [(0, v, u, -1.0) for u, v in edges],
        schema="grp long, r long, c long, v double",
    )
    diag = spark.createDataFrame(
        [(0, i + 1, float(A[i, i])) for i in range(n)], schema="grp long, r long, d double"
    )
    h = mg_setup(off, diag, factor=2, tail_threshold=4)
    assert len(h.levels) >= 2  # genuinely distributed levels
    rng = np.random.default_rng(7)
    rvec = rng.normal(size=n)
    r_df = spark.createDataFrame(
        [(0, i + 1, float(rvec[i])) for i in range(n)], schema="grp long, r long, x double"
    )
    got = {r["r"]: r["z"] for r in mg_vcycle(h, r_df).collect()}
    exp = _np_vcycle(_np_tail_levels(A, 2), rvec)
    assert max(abs(got[i + 1] - exp[i]) for i in range(n)) < 1e-12


def test_inverse_distributed_pcg_matches_numpy(spark):
    """The distributed MG-PCG (mg_tail_threshold forces DataFrame levels)
    must match the serial reference arithmetic after the same number of
    CG steps (mpass=1, miter=3, tol=0 → exactly 3 steps both sides)."""
    import numpy as np

    from parrsb_spark.operators.multigrid import np_inverse_fiedler

    n = 12
    edges = [(i, i + 1) for i in range(1, n)]
    df = graphs.to_df(spark, edges)
    opts = _opts(
        rsb_max_iter=3, rsb_max_passes=1, rsb_tol=0.0,
        rsb_algo="inverse", mg_tail_threshold=4,
    )
    got = {r["vid"]: r["fiedler"] for r in fiedler(df, opts=opts, sign_fix=False).collect()}
    A = np.zeros((n, n))
    for u, v in edges:
        A[u-1, u-1] += 1; A[v-1, v-1] += 1; A[u-1, v-1] -= 1; A[v-1, u-1] -= 1
    z = np.arange(1, n + 1, dtype=float)
    z[: n // 2] += 1000 * n
    z = z - z.mean(); z = z / np.linalg.norm(z)
    exp = np_inverse_fiedler(A, z, 3, 1, 0.0, 2)
    assert max(abs(got[i + 1] - exp[i]) for i in range(n)) < 1e-8


def test_rsb_grid_cuts_optimal(spark):
    """E7 cut-aware boundary tie-break: on symmetric grids the fiedler
    median is tied, and the cut-blind vid tie-break can cost edge-cut;
    with the boundary re-assignment the straight-line optimal cuts are
    achieved (ref balance_partitions boundary moves, src/rsb.c:118-229)."""
    opts = _opts(rsb_max_iter=40, rsb_max_passes=5, rsb_tol=1e-8)
    for (nx, ny), k, optimal in [((4, 4), 2, 4), ((4, 4), 4, 8), ((6, 6), 2, 6)]:
        edges, _ = graphs.grid2d(nx, ny)
        df = graphs.to_df(spark, edges)
        parts = rsb_partition(df, k, opts=opts)
        assert edge_cut(df, parts) <= optimal, (nx, ny, k)
        sizes = sorted(r["n"] for r in partition_sizes(parts).collect())
        assert max(sizes) - min(sizes) <= 1


@pytest.mark.parametrize("factor", [2, 4])
def test_rsb_inverse_cuts_the_bridge(spark, factor):
    """RSB end-to-end on the inverse path at MG factors 2 and 4 — the
    reference's CI matrix (ref .github/workflows/ci.yml:68-95)."""
    edges = graphs.two_cliques_bridge(8)
    df = graphs.to_df(spark, edges)
    opts = _opts(
        rsb_max_iter=40, rsb_max_passes=20, rsb_tol=1e-8,
        rsb_algo="inverse", rsb_mg_factor=factor,
    )
    parts = rsb_partition(df, 2, opts=opts)
    assert edge_cut(df, parts) == 1
    sizes = {r["part"]: r["n"] for r in partition_sizes(parts).collect()}
    assert sorted(sizes.values()) == [8, 8]


def test_rsb_algo_unknown_raises(spark):
    df = graphs.to_df(spark, graphs.grid2d(3, 3)[0])
    with pytest.raises(ValueError, match="rsb_algo"):
        fiedler(df, opts=_opts(rsb_algo="does-not-exist"))


def test_rsb_cuts_the_bridge(spark):
    """Bisection of two cliques + bridge must cut exactly the bridge."""
    edges = graphs.two_cliques_bridge(8)
    df = graphs.to_df(spark, edges)
    parts = rsb_partition(df, 2, opts=_opts())
    assert edge_cut(df, parts) == 1
    sizes = {r["part"]: r["n"] for r in partition_sizes(parts).collect()}
    assert sorted(sizes.values()) == [8, 8]
    # each clique lands in one part
    rows = {r["vid"]: r["part"] for r in parts.collect()}
    assert len({rows[v] for v in range(1, 9)}) == 1
    assert len({rows[v] for v in range(9, 17)}) == 1


def test_rsb_balance_and_gate(spark):
    """Reference quality gate: comm volume after RSB ≤ block partition's
    (genmap --test, ref examples/genmap.c:75-78); sizes within ±1."""
    edges, _ = graphs.grid2d(6, 6)
    df = graphs.to_df(spark, edges)
    for k in (2, 4):
        parts = rsb_partition(df, k, opts=_opts())
        sizes = [r["n"] for r in partition_sizes(parts).collect()]
        assert len(sizes) == k
        assert max(sizes) - min(sizes) <= 1
        gate = quality_gate(df, parts, k)
        assert gate["ok"], gate


def test_rsb_k3_uneven(spark):
    """Non-power-of-two k follows the reference's n0=⌈np/2⌉ halving."""
    edges, _ = graphs.grid2d(5, 4)
    df = graphs.to_df(spark, edges)
    parts = rsb_partition(df, 3, opts=_opts())
    sizes = sorted(r["n"] for r in partition_sizes(parts).collect())
    assert len(sizes) == 3 and sum(sizes) == 20
    assert max(sizes) - min(sizes) <= 4  # proportional split: 10 → 5,5; other 10


def test_rcb_grid(spark):
    edges, coords = graphs.grid2d(8, 8)
    cdf = graphs.coords_to_df(spark, coords)
    parts = rcb_partition(cdf, 4, dims=2)
    sizes = [r["n"] for r in partition_sizes(parts).collect()]
    assert len(sizes) == 4 and max(sizes) - min(sizes) <= 1
    # RCB on a uniform grid = quadrants → cut ≤ 2 straight lines
    edf = graphs.to_df(spark, edges)
    assert edge_cut(edf, parts) <= 16


def test_rib_stretched_grid(spark):
    """RIB's principal axis on a stretched grid = the long axis; the first
    cut must split along it (same as RCB here)."""
    edges, coords = graphs.grid2d(16, 2)
    cdf = graphs.coords_to_df(spark, coords)
    parts = rib_partition(cdf, 2, dims=2)
    sizes = [r["n"] for r in partition_sizes(parts).collect()]
    assert sizes == [16, 16]
    edf = graphs.to_df(spark, edges)
    assert edge_cut(edf, parts) == 2  # one straight cut across the 2-row grid


def test_contract_aliases_wraps_grid(spark):
    """Contracting left≡right columns of a grid (periodic aliasing,
    ref src/con-periodic.c) merges those vertex pairs."""
    edges, aliases = graphs.periodic_alias(4, 3)
    edf = graphs.to_df(spark, edges)
    adf = graphs.to_df(spark, aliases)
    e2, mapping = contract_aliases(edf, adf)
    m = {r["vid"]: r["canon"] for r in mapping.collect()}
    for u, v in aliases:
        assert m[u] == m[v] == min(u, v)
    # contracted graph has 12-3=9 vertices
    vs = {r["src"] for r in e2.collect()} | {r["dst"] for r in e2.collect()}
    assert len(vs) == 9


def test_fiedler_parallelism_invariance(spark):
    """Same fiedler vector (1e-9) under forced repartitioning."""
    edges = graphs.two_cliques_bridge(6)
    df = graphs.to_df(spark, edges)
    a = {r["vid"]: r["fiedler"] for r in fiedler(df, opts=_opts()).collect()}
    b = {r["vid"]: r["fiedler"] for r in fiedler(df.repartition(3), opts=_opts()).collect()}
    for v in a:
        assert abs(a[v] - b[v]) < 1e-9
