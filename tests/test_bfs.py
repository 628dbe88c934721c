"""Multi-source BFS hop distances vs a pure-python oracle.

Topologies chosen for what frontier BFS can get wrong: a long path
(per-round frontier of ONE vertex — exercises the full loop depth and
the settled anti-join), two components (unreachable vertices must be
ABSENT, not defaulted), a star hub (whole graph settles in one round;
the next round's empty frontier must early-exit), a directed ring
(direction semantics: directed dist is i, symmetrized is min(i, n-i)),
and a random power-law graph (general agreement). Plus the truncation
contract: max_hops smaller than the eccentricity yields exactly the
within-budget prefix.
"""

from __future__ import annotations

import pytest

from parrsb_spark import graphs
from parrsb_spark.operators.bfs import bfs_distances
from tests.oracles import bfs_np


def _run(spark, edges, seeds, **kw):
    sdf = spark.createDataFrame([(int(s),) for s in seeds], schema="vid long")
    out = bfs_distances(graphs.to_df(spark, edges), sdf, **kw)
    return {r["vid"]: r["dist"] for r in out.collect()}


def _path(n):
    return [(i, i + 1) for i in range(n - 1)]


def test_bfs_path_exact_depth(spark):
    got = _run(spark, _path(9), [0], max_hops=16)
    assert got == {i: i for i in range(9)}


def test_bfs_unreachable_absent(spark):
    edges = graphs.two_components(3, 3)
    seeds = [min(u for u, _ in edges)]
    got = _run(spark, edges, seeds, max_hops=16)
    exp = bfs_np(edges, seeds)
    assert got == exp
    all_vids = {v for e in edges for v in e}
    assert set(got) < all_vids  # the other component is absent


def test_bfs_star_hub_one_round(spark):
    edges = graphs.star_hub(20)
    hub = [u for u, _ in edges][0]
    got = _run(spark, edges, [hub], max_hops=16)
    assert got == bfs_np(edges, [hub])
    assert set(got.values()) == {0, 1}


def test_bfs_directed_vs_symmetrized_ring(spark):
    n = 7
    edges = graphs.ring(n)
    verts = sorted({v for e in edges for v in e})
    base = verts[0]
    d_dir = _run(spark, edges, [base], max_hops=16, directed=True)
    d_sym = _run(spark, edges, [base], max_hops=16)
    assert d_dir == bfs_np(edges, [base], directed=True)
    assert d_sym == bfs_np(edges, [base])
    assert sorted(d_dir.values()) == list(range(n))
    assert max(d_sym.values()) == n // 2


def test_bfs_multi_seed_powerlaw(spark):
    edges = graphs.powerlaw(60, m=2, seed=7)
    verts = sorted({v for e in edges for v in e})
    seeds = verts[:3]
    got = _run(spark, edges, seeds, max_hops=16)
    assert got == bfs_np(edges, seeds)


def test_bfs_truncation_is_prefix(spark):
    edges = _path(12)
    full = _run(spark, edges, [0], max_hops=20)
    cut = _run(spark, edges, [0], max_hops=4)
    assert cut == {v: d for v, d in full.items() if d <= 4}


def test_bfs_duplicate_seeds_dedup(spark):
    edges = _path(5)
    got = _run(spark, edges, [0, 0, 2], max_hops=8)
    assert got == bfs_np(edges, [0, 2])
