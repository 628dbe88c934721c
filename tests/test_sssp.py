"""Weighted shortest paths (frontier Bellman-Ford) vs a pure-python
Bellman-Ford oracle.

Topologies chosen for what delta-pruned relaxation can get wrong: a
weighted path whose direct edge LOSES to a longer-hop cheaper detour
(a settled vertex must re-enter the frontier when improved), two
components (unreachable absent), a directed ring (direction semantics),
a random power-law graph with endpoint-derived weights (general
agreement, multigraph reverse duplicates), and the truncation contract
(best ≤r-edge paths at every r, converged or not).
"""

from __future__ import annotations

from parrsb_spark import graphs
from parrsb_spark.operators.sssp import sssp
from tests.oracles import sssp_np


def _run(spark, wedges, seeds, **kw):
    df = spark.createDataFrame(
        [(int(u), int(v), int(w)) for u, v, w in wedges], schema="src long, dst long, w long"
    )
    sdf = spark.createDataFrame([(int(s),) for s in seeds], schema="vid long")
    out = sssp(df, sdf, **kw)
    return {r["vid"]: r["dist"] for r in out.collect()}


def _weighted(edges, mod=7):
    return [(u, v, (u + v) % mod + 1) for u, v in edges]


def test_sssp_detour_beats_direct_edge(spark):
    # 0→3 direct costs 10; 0→1→2→3 costs 3. Vertex 3 is reached in
    # round 1 at 10 and must be IMPROVED (re-enter the frontier) later.
    wedges = [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1)]
    got = _run(spark, wedges, [0], max_rounds=16)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}
    assert got == sssp_np(wedges, [0])


def test_sssp_unreachable_absent(spark):
    edges = graphs.two_components(3, 3)
    wedges = _weighted(edges)
    seeds = [min(u for u, _ in edges)]
    got = _run(spark, wedges, seeds, max_rounds=16)
    assert got == sssp_np(wedges, seeds)
    assert set(got) < {v for e in edges for v in e}


def test_sssp_directed_vs_undirected_ring(spark):
    wedges = [(u, v, 2) for u, v in graphs.ring(6)]
    base = min(u for u, _, _ in wedges)
    d_dir = _run(spark, wedges, [base], max_rounds=16, directed=True)
    d_und = _run(spark, wedges, [base], max_rounds=16)
    assert d_dir == sssp_np(wedges, [base], directed=True)
    assert d_und == sssp_np(wedges, [base])
    assert max(d_dir.values()) == 2 * 5  # full loop one way
    assert max(d_und.values()) == 2 * 3  # min(i, n-i) hops × 2


def test_sssp_multi_seed_powerlaw(spark):
    wedges = _weighted(graphs.powerlaw(60, m=2, seed=11))
    verts = sorted({v for u, v, _ in wedges} | {u for u, _, _ in wedges})
    seeds = verts[:3]
    got = _run(spark, wedges, seeds, max_rounds=24)
    assert got == sssp_np(wedges, seeds)


def test_sssp_truncation_matches_bounded_oracle(spark):
    wedges = [(i, i + 1, 1) for i in range(11)] + [(0, 11, 25)]
    for r in (2, 5, 20):
        got = _run(spark, wedges, [0], max_rounds=r)
        assert got == sssp_np(wedges, [0], max_rounds=r), r


def test_sssp_hop_metric_degenerates_to_bfs(spark):
    from tests.oracles import bfs_np

    edges = graphs.powerlaw(40, m=2, seed=3)
    wedges = [(u, v, 1) for u, v in edges]
    got = _run(spark, wedges, [min(u for u, _ in edges)], max_rounds=16)
    assert got == bfs_np(edges, [min(u for u, _ in edges)])
