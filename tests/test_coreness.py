"""Core decomposition vs closed forms and a brute peel oracle.

Closed forms hit the definition's edges: a clique (coreness c-1
everywhere), a path (1 everywhere), a clique with a pendant path (the
path peels to 1, the clique keeps c-1 — the profile `kcore`'s single
threshold can't see), and a two-shell graph where the h-index
iteration needs >1 round (degree over-estimates must propagate down).
The brute oracle is the textbook repeated-min-degree peel."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from parrsb_spark.operators.coreness import coreness


def _brute(edges):
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    live = {v: set(ns) for v, ns in adj.items()}
    core = {}
    k = 0
    while live:
        k = max(k, min(len(ns) for ns in live.values()))
        while live and min(len(ns) for ns in live.values()) <= k:
            v = next(v for v, ns in live.items() if len(ns) <= k)
            core[v] = k
            for u in live[v]:
                live[u].discard(v)
            del live[v]
    return core


def _got(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {r["vid"]: r["core"] for r in coreness(e, **kw).collect()}


def test_coreness_clique_and_path(spark):
    k5 = [(a, b) for a, b in combinations(range(5), 2)]
    assert _got(spark, k5) == {v: 4 for v in range(5)}
    path = [(i, i + 1) for i in range(5)]
    assert _got(spark, path) == {v: 1 for v in range(6)}


def test_coreness_clique_with_pendant_path(spark):
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    edges = k4 + [(3, 10), (10, 11), (11, 12)]
    got = _got(spark, edges)
    assert got == _brute(edges)
    assert got[0] == 3 and got[12] == 1


def test_coreness_two_shell_propagation(spark):
    """A 4-clique ringed by degree-2 vertices: the ring's initial
    degree estimate (2) must flow into the clique's h-index over
    multiple rounds; a single-round h-index would over-report."""
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    ring = [(0, 10), (1, 10), (1, 11), (2, 11), (2, 12), (3, 12)]
    edges = k4 + ring
    got = _got(spark, edges)
    assert got == _brute(edges)


def test_coreness_matches_brute_on_er(spark):
    import random

    random.seed(11)
    es = list({(random.randrange(40), random.randrange(40)) for _ in range(140)})
    es = [(a, b) for a, b in es if a != b]
    assert _got(spark, es) == _brute(es)


def test_coreness_layout_independence(spark):
    import random

    random.seed(3)
    es = list({(random.randrange(30), random.randrange(30)) for _ in range(80)})
    es = [(a, b) for a, b in es if a != b]
    base = spark.createDataFrame(es, "src long, dst long")
    a = {tuple(r) for r in coreness(base).collect()}
    b = {tuple(r) for r in coreness(base.repartition(7, "dst")).collect()}
    assert a == b


def test_coreness_round_bound_contract(spark):
    """An insufficient round bound still equals the same-bound replay:
    estimates after exactly r rounds are well-defined (here just
    monotonicity + the degree upper bound at r=1)."""
    star_path = [(0, i) for i in range(1, 8)] + [(7, 8), (8, 9)]
    e = spark.createDataFrame(star_path, "src long, dst long")
    r1 = {x["vid"]: x["core"] for x in coreness(e, max_rounds=1).collect()}
    full = {x["vid"]: x["core"] for x in coreness(e).collect()}
    assert all(r1[v] >= full[v] for v in full)  # monotone from above
