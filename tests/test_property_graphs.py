"""Hypothesis property tests: north-rule kernels on RANDOM graphs.

The fixed-fixture oracle tests (test_kernels.py) pin the kernels on
known topologies; these drive the SAME independent numpy oracles
(tests/oracles.py) over hypothesis-generated edge lists, covering the
structure the fixtures can't enumerate — self-loops, parallel edges,
dangling vertices, isolated pairs, multi-component soups, degenerate
coordinates. Semantics under test:

- pagerank: multigraph semantics (parallel edges and self-loops count
  in out-degree and contribution, exactly as pagerank_np does);
- cc / labelprop / triangles: run on `symmetrize(...)` (dedup'd, no
  self-loops), matching the oracles' `_sym_adj`;
- rcb: exact proportional balance and permutation-of-input coverage on
  arbitrary (including duplicated / collinear) point sets.

Settings: derandomize=True keeps CI deterministic; examples are small
(each one costs real Spark jobs) — the value is structural diversity,
not volume.
"""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from parrsb_spark import graphs
from parrsb_spark.operators.components import connected_components
from parrsb_spark.operators.labelprop import label_propagation
from parrsb_spark.operators.pagerank import pagerank
from parrsb_spark.operators.rcb import rcb_partition
from parrsb_spark.operators.triangles import triangle_counts
from tests.oracles import components_np, labelprop_np, pagerank_np, triangles_np

# arbitrary directed multigraph on ≤10 vids: self-loops, parallel
# edges, and unreferenced vids (dangling/isolated) all possible
edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=28
)

PROP = settings(max_examples=12, deadline=None, derandomize=True)


@given(edges=edge_lists)
@PROP
def test_pagerank_matches_numpy_on_random_multigraphs(spark, edges):
    df = graphs.to_df(spark, edges)
    got = {r["vid"]: r["pr"] for r in pagerank(df, fixed_iters=8).collect()}
    exp = pagerank_np(edges, iters=8)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9, (v, edges)
    assert abs(sum(got.values()) - 1.0) < 1e-9


@given(edges=edge_lists)
@PROP
def test_components_exact_on_random_graphs(spark, edges):
    df = graphs.to_df(spark, edges)
    got = {r["vid"]: r["comp"] for r in connected_components(df).collect()}
    assert got == components_np(edges), edges


@given(edges=edge_lists)
@PROP
def test_triangles_exact_on_random_graphs(spark, edges):
    df = graphs.to_df(spark, edges)
    got = {r["vid"]: r["tri"] for r in triangle_counts(df).collect()}
    assert got == triangles_np(edges), edges


@given(edges=edge_lists)
@PROP
def test_labelprop_matches_numpy_on_random_graphs(spark, edges):
    df = graphs.to_df(spark, edges)
    got = {r["vid"]: r["label"] for r in label_propagation(df, n_iter=3).collect()}
    assert got == labelprop_np(edges, n_iter=3), edges


@given(
    pts=st.lists(
        st.tuples(
            st.integers(-8, 8),  # integer grid → ties and collinear runs
            st.integers(-8, 8),
            st.integers(-8, 8),
        ),
        min_size=8,
        max_size=40,
    ),
    k=st.sampled_from([2, 4]),
)
@settings(max_examples=10, deadline=None, derandomize=True)
def test_rcb_balance_and_coverage_on_random_points(spark, pts, k):
    """RCB output is a permutation of the input vids into k parts whose
    sizes are the exact recursive ⌈n·n0/np⌉ proportional split — even
    with duplicated points and zero-extent axes (all ties broken by the
    vid sort key in grouped_rank, so the split stays exact)."""
    coords = {i: (float(x), float(y), float(z)) for i, (x, y, z) in enumerate(pts)}
    df = graphs.coords_to_df(spark, coords)
    rows = rcb_partition(df, k).collect()
    assert sorted(r["vid"] for r in rows) == sorted(coords)
    sizes = {}
    for r in rows:
        sizes[r["part"]] = sizes.get(r["part"], 0) + 1
    assert set(sizes) <= set(range(k))

    def expected_sizes(n, np_):
        if np_ == 1:
            return [n]
        n0 = (np_ + 1) // 2
        import math

        t0 = math.ceil(n * n0 / np_)
        return expected_sizes(t0, n0) + expected_sizes(n - t0, np_ - n0)

    exp = expected_sizes(len(coords), k)
    assert [sizes.get(p, 0) for p in range(k)] == exp, (sizes, exp)
