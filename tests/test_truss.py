"""k-truss vs closed forms and a brute fixed-point oracle.

Closed forms hit the definition's edges: K5 (every edge support 3 —
the 5-truss keeps it whole, the 6-truss peels it empty in one round),
the two-triangles-shared-edge bowtie (the shared edge ALONE survives
the first 4-truss round with support 2, then loses both its triangles
and peels — the cascade a single-pass support filter would miss), and
a clique with a pendant path (truss strips the path, keeps the clique
— the bridges-peel property that distinguishes truss from core: the
path vertices are in the 2-core but no edge of the path closes a
triangle).
"""

from __future__ import annotations

from itertools import combinations

import pytest

from parrsb_spark import graphs
from parrsb_spark.operators.truss import truss


def _brute(edges, k):
    alive = {tuple(sorted(e)) for e in edges if e[0] != e[1]}

    def support(es):
        out = {}
        for u, v in es:
            out[(u, v)] = sum(
                1
                for w in set(x for e in es for x in e)
                if w not in (u, v)
                and tuple(sorted((u, w))) in es
                and tuple(sorted((v, w))) in es
            )
        return out

    while True:
        sup = support(alive)
        nxt = {e for e in alive if sup[e] >= k - 2}
        if nxt == alive:
            return {e: sup[e] for e in alive}
        alive = nxt


def _got(df):
    return {(r["u"], r["v"]): r["support"] for r in df.collect()}


def test_truss_k5_complete_graph(spark):
    k5 = [(a, b) for a, b in combinations(range(5), 2)]
    e = spark.createDataFrame(k5, "src long, dst long")
    got = _got(truss(e, k=5))
    assert got == {p: 3 for p in k5}  # every edge in 3 triangles
    assert _got(truss(e, k=6)) == {}  # support 3 < 4: peels empty


def test_truss_bowtie_cascade(spark):
    # triangles {0,1,2} and {1,2,3} share edge (1,2)
    bow = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    e = spark.createDataFrame(bow, "src long, dst long")
    assert _got(truss(e, k=3)) == {(0, 1): 1, (0, 2): 1, (1, 2): 2, (1, 3): 1, (2, 3): 1}
    # k=4: round 1 keeps only (1,2) (support 2); round 2 peels it too
    assert _got(truss(e, k=4)) == {}


def test_truss_strips_pendant_path_keeps_clique(spark):
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    path = [(3, 10), (10, 11), (11, 12)]
    e = spark.createDataFrame(k4 + path, "src long, dst long")
    got = _got(truss(e, k=4))
    assert set(got) == set(k4)  # path gone, clique whole
    assert all(s == 2 for s in got.values())


def test_truss_matches_brute_on_powerlaw(spark):
    edges = graphs.powerlaw(40, m=4, seed=9)
    e = spark.createDataFrame(edges, "src long, dst long")
    for k in (3, 4):
        assert _got(truss(e, k=k)) == _brute(edges, k)


def test_truss_exact_across_partitionings(spark):
    edges = graphs.powerlaw(40, m=4, seed=2)
    base = spark.createDataFrame(edges, "src long, dst long")
    a = _got(truss(base.repartition(1), k=3))
    b = _got(truss(base.orderBy("dst").repartition(16), k=3))
    assert a == b


def test_truss_bounded_rounds_match_unrolled_semantics(spark):
    # max_rounds caps the peel: after 1 round of k=4 on the bowtie the
    # shared edge is still alive (its support REcomputed on the
    # survivor set is then 0 — the round-capped contract the oracle
    # unrolls)
    bow = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    e = spark.createDataFrame(bow, "src long, dst long")
    assert _got(truss(e, k=4, max_rounds=1)) == {(1, 2): 0}
