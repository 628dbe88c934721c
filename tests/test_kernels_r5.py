"""Round-5 kernel additions vs numpy oracles: HITS, k-core, PPR.

Same discipline as test_kernels.py: fixture topologies chosen to hit
the structure each kernel can get wrong — HITS on graphs with pure
sources/sinks and hub asymmetry (normalization + gather direction),
k-core on a clique-with-tail whose peel CASCADES over several rounds
(fixed-point-vs-rounds parity), PPR on graphs with dangling mass
(restart-to-seeds semantics, Σpr = 1 conservation).
"""

from __future__ import annotations

import pytest

from parrsb_spark import graphs
from parrsb_spark.operators.hits import hits
from parrsb_spark.operators.kcore import kcore
from parrsb_spark.operators.pagerank import personalized_pagerank
from tests.oracles import hits_np, kcore_np, ppr_np


def _clique_with_tail(k: int, tail: int) -> list[tuple[int, int]]:
    """k-clique 0..k-1 plus a path k-1 → k → k+1 → ... The path peels
    one vertex per round under (k-1)-core peeling — a multi-round
    cascade, not a single sweep."""
    edges = [(i, j) for i in range(k) for j in range(i + 1, k)]
    prev = k - 1
    for t in range(tail):
        edges.append((prev, k + t))
        prev = k + t
    return edges


HITS_GRAPHS = [
    graphs.star_hub(12),                      # pure hub/authority split
    graphs.ring(9),                           # directed cycle: symmetric scores
    graphs.powerlaw(40, m=3, seed=11),        # skewed degrees
    [(0, 1), (0, 2), (3, 0), (4, 4), (5, 6)], # source, sink, self-loop, isle
]


@pytest.mark.parametrize("edges", HITS_GRAPHS, ids=["star", "ring", "plaw", "mixed"])
def test_hits_matches_numpy(spark, edges):
    got = {r["vid"]: (r["hub"], r["auth"]) for r in hits(graphs.to_df(spark, edges), n_iter=5).collect()}
    exp = hits_np(edges, n_iter=5)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v][0] == pytest.approx(exp[v][0], abs=1e-9), ("hub", v)
        assert got[v][1] == pytest.approx(exp[v][1], abs=1e-9), ("auth", v)


def test_hits_norms_are_unit(spark):
    rows = hits(graphs.to_df(spark, graphs.powerlaw(30, m=2, seed=3)), n_iter=4).collect()
    assert sum(r["hub"] ** 2 for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert sum(r["auth"] ** 2 for r in rows) == pytest.approx(1.0, abs=1e-9)


def test_kcore_cascading_peel(spark):
    """The tail peels one vertex per round (5 rounds), then the clique
    alone survives with full internal degree."""
    edges = _clique_with_tail(6, 5)
    got = {r["vid"]: r["core_deg"] for r in kcore(graphs.to_df(spark, edges), k=5).collect()}
    assert got == kcore_np(edges, 5)
    assert set(got) == set(range(6)) and all(d == 5 for d in got.values())


@pytest.mark.parametrize("k", [2, 3, 4])
def test_kcore_matches_numpy_on_powerlaw(spark, k):
    edges = graphs.powerlaw(60, m=3, seed=7)
    got = {r["vid"]: r["core_deg"] for r in kcore(graphs.to_df(spark, edges), k=k).collect()}
    assert got == kcore_np(edges, k)


def test_kcore_empty_when_k_exceeds_max_degree(spark):
    got = kcore(graphs.to_df(spark, graphs.ring(8)), k=3).collect()
    assert got == []


def test_ppr_matches_numpy_and_conserves_mass(spark):
    # powerlaw has dangling vertices under direction; restart mass must
    # return to the seeds and total mass stay exactly 1
    edges = graphs.powerlaw(50, m=2, seed=9)
    df = graphs.to_df(spark, edges)
    seeds = sorted({u for u, _ in edges})[:3]
    got = {r["vid"]: r["pr"] for r in personalized_pagerank(df, graphs.to_df(spark, [(s, s) for s in seeds]).select("src").withColumnRenamed("src", "vid").distinct(), fixed_iters=6).collect()}
    exp = ppr_np(edges, seeds, iters=6)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_ppr_zero_outside_reachable_set(spark):
    # two components; seeding one leaves the other at exactly 0
    edges = graphs.two_components(3, 3)
    df = graphs.to_df(spark, edges)
    comp0 = {u for u, _ in edges} | {v for _, v in edges}
    seed = min(comp0)
    seeds_df = df.sparkSession.createDataFrame([(seed,)], "vid long")
    got = {r["vid"]: r["pr"] for r in personalized_pagerank(df, seeds_df, fixed_iters=5).collect()}
    exp = ppr_np(edges, [seed], iters=5)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    # vertices not co-component with the seed hold exactly zero
    from tests.oracles import components_np

    comp = components_np(edges)
    for v, p in got.items():
        if comp[v] != comp[seed]:
            assert p == 0.0
