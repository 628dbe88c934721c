"""M2 iterative kernels vs numpy oracles (FIXTURES.md §4 contracts:
PageRank allclose 1e-6, components & triangles exact)."""

import pytest

from parrsb_spark import graphs
from parrsb_spark.operators.components import cc_bfs_single_seed, connected_components
from parrsb_spark.operators.labelprop import label_propagation
from parrsb_spark.operators.pagerank import pagerank
from parrsb_spark.operators.triangles import (
    clustering_coefficients,
    triangle_counts,
    triangle_total,
)
from tests.oracles import components_np, labelprop_np, lcc_np, pagerank_np, triangles_np


@pytest.mark.parametrize(
    "name,edges",
    [
        ("ring", graphs.ring(16)),
        ("star", graphs.star_hub(30)),
        ("powerlaw", graphs.powerlaw(120, m=3, seed=42)),
    ],
)
def test_pagerank_allclose(spark, name, edges):
    df = graphs.to_df(spark, edges)
    got = {r["vid"]: r["pr"] for r in pagerank(df, fixed_iters=15).collect()}
    exp = pagerank_np(edges, iters=15)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-6, (name, v)


def test_pagerank_converged_mode(spark):
    edges = graphs.powerlaw(100, m=3, seed=7)
    df = graphs.to_df(spark, edges)
    got = {r["vid"]: r["pr"] for r in pagerank(df, tol=1e-10, max_iter=100).collect()}
    exp = pagerank_np(edges, iters=200)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-6
    # probability mass sums to 1
    assert abs(sum(got.values()) - 1.0) < 1e-9


@pytest.mark.parametrize(
    "edges",
    [
        graphs.two_components(3, 3),
        graphs.powerlaw(100, m=2, seed=42),
        graphs.ring(17),
    ],
)
def test_connected_components_exact(spark, edges):
    df = graphs.to_df(spark, edges)
    got = {r["vid"]: r["comp"] for r in connected_components(df).collect()}
    exp = components_np(edges)
    assert got == exp


def test_cc_dual_impl_cross_validation(spark):
    """Reference meta-pattern (test_component_versions, ref src/rsb.c:9-44):
    two independent CC implementations must agree on component count."""
    edges = graphs.two_components(4, 3)
    df = graphs.to_df(spark, edges)
    v2 = connected_components(df)
    v1 = cc_bfs_single_seed(df)
    assert v2.select("comp").distinct().count() == 2
    assert v1.select("comp_idx").distinct().count() == 2
    # and the induced partitions of vertices are identical
    g1 = {r["vid"]: r["comp_idx"] for r in v1.collect()}
    g2 = {r["vid"]: r["comp"] for r in v2.collect()}
    by1, by2 = {}, {}
    for v in g1:
        by1.setdefault(g1[v], set()).add(v)
        by2.setdefault(g2[v], set()).add(v)
    assert sorted(map(sorted, by1.values())) == sorted(map(sorted, by2.values()))


@pytest.mark.parametrize(
    "edges,expected_total",
    [
        (graphs.two_cliques_bridge(8), 2 * 56),  # 2 × C(8,3)=56
        (graphs.ring(12), 0),
        (graphs.star_hub(20), 0),
    ],
)
def test_triangle_totals(spark, edges, expected_total):
    df = graphs.to_df(spark, edges)
    assert triangle_total(df) == expected_total


def test_triangle_counts_per_vertex(spark):
    edges = graphs.powerlaw(100, m=3, seed=42)
    df = graphs.to_df(spark, edges)
    got = {r["vid"]: r["tri"] for r in triangle_counts(df).collect()}
    exp = triangles_np(edges)
    assert got == exp


def test_clustering_coefficients_match_oracle(spark):
    # powerlaw: general agreement incl. deg-1 leaves (lcc must be 0.0,
    # not NaN); cliques+bridge: interior clique vertices at lcc == 1.0
    for edges in (graphs.powerlaw(80, m=3, seed=7), graphs.two_cliques_bridge(6)):
        df = graphs.to_df(spark, edges)
        got = {r["vid"]: (r["tri"], r["deg"], r["lcc"]) for r in clustering_coefficients(df).collect()}
        exp = lcc_np(edges)
        assert set(got) == set(exp)
        for v in exp:
            assert got[v][:2] == exp[v][:2], v
            assert got[v][2] == pytest.approx(exp[v][2], abs=1e-12), v


def test_clustering_coefficient_clique_is_one(spark):
    edges = graphs.two_cliques_bridge(8)
    df = graphs.to_df(spark, edges)
    vals = {r["vid"]: r["lcc"] for r in clustering_coefficients(df).collect()}
    assert sum(1 for x in vals.values() if x == 1.0) >= 12  # non-bridge clique members


def test_label_propagation_matches_oracle(spark):
    edges = graphs.two_cliques_bridge(6)
    df = graphs.to_df(spark, edges)
    got = {r["vid"]: r["label"] for r in label_propagation(df, n_iter=4).collect()}
    exp = labelprop_np(edges, n_iter=4)
    assert got == exp


def test_parallelism_invariance(spark):
    """FIXTURES.md §6: identical results under different partitioning
    (the np ∈ {1,2,3,4} axis of the reference CI)."""
    edges = graphs.powerlaw(100, m=2, seed=42)
    df = graphs.to_df(spark, edges)
    base = {r["vid"]: r["comp"] for r in connected_components(df).collect()}
    for nparts in (1, 3):
        rep = df.repartition(nparts)
        got = {r["vid"]: r["comp"] for r in connected_components(rep).collect()}
        assert got == base
    pr_base = {r["vid"]: r["pr"] for r in pagerank(df, fixed_iters=10).collect()}
    pr_rep = {r["vid"]: r["pr"] for r in pagerank(df.repartition(3), fixed_iters=10).collect()}
    for v in pr_base:
        assert abs(pr_base[v] - pr_rep[v]) < 1e-12


def test_pagerank_chain_invariance(spark):
    """Burst size must not change values (chain only affects job count)."""
    edges = graphs.powerlaw(80, m=3, seed=11)
    df = graphs.to_df(spark, edges)
    a = {r["vid"]: r["pr"] for r in pagerank(df, fixed_iters=6, chain=1).collect()}
    b = {r["vid"]: r["pr"] for r in pagerank(df, fixed_iters=6, chain=3).collect()}
    for v in a:
        assert abs(a[v] - b[v]) < 1e-15


def test_weighted_pagerank_identical_plan_when_w1(spark):
    """weight_col with all-ones weights must equal the unweighted run
    EXACTLY (same recurrence, outdeg = sum(1) either way)."""
    from parrsb_spark.operators.pagerank import pagerank

    df = graphs.to_df(spark, graphs.powerlaw(40, m=3, seed=4))
    from pyspark.sql import functions as F

    w1 = df.withColumn("w", F.lit(1).cast("long"))
    a = {r["vid"]: r["pr"] for r in pagerank(df, fixed_iters=8).collect()}
    b = {r["vid"]: r["pr"] for r in pagerank(w1, fixed_iters=8, weight_col="w").collect()}
    assert a == b  # exact ==


def test_weighted_pagerank_multiplicity_equals_duplicated_edges(spark):
    """Weight-w edges must rank like w parallel unweighted edges (the
    host-rollup semantics: weight = page-level link multiplicity)."""
    from parrsb_spark.operators.pagerank import pagerank

    base = [(0, 1), (1, 2), (2, 0), (0, 2)]
    weights = {(0, 1): 3, (1, 2): 1, (2, 0): 2, (0, 2): 1}
    wdf = spark.createDataFrame(
        [(a, b, weights[(a, b)]) for a, b in base], "src long, dst long, w long"
    )
    dup = spark.createDataFrame(
        [e for e in base for _ in range(weights[e])], "src long, dst long"
    )
    got = {r["vid"]: r["pr"] for r in pagerank(wdf, fixed_iters=12, weight_col="w").collect()}
    want = {r["vid"]: r["pr"] for r in pagerank(dup, fixed_iters=12).collect()}
    assert set(got) == set(want)
    for v in want:  # same recurrence, different float association order
        assert abs(got[v] - want[v]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved
