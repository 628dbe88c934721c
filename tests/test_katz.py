"""Katz centrality vs an exact sequential replay.

The kernel's contract is the round-R truncation Σ α^k·w_k with exact
integer walk counts, so the reference is a 10-line integer walk-count
recursion evaluated in the identical ascending-k order — the floats
must match EXACTLY (==), not approximately; that's the bitwise
contract the oracle row relies on. Closed forms: on K_n every walk
count is n-1 times the previous (w_k = (n-1)^k), on a star the hub
sees leaf-count walks at odd lengths."""

from __future__ import annotations

import random
from collections import defaultdict
from itertools import combinations

from pyspark.sql import functions as F

from parrsb_spark.operators.katz import katz_centrality

ALPHA, R = 0.01, 6


def _seq_katz(edges, alpha=ALPHA, rounds=R):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    w = {v: 1 for v in adj}
    katz = {v: 0.0 for v in adj}
    for k in range(1, rounds + 1):
        w = {v: sum(w[u] for u in adj[v]) for v in adj}
        for v in adj:
            katz[v] = katz[v] + alpha ** k * float(w[v])
    return katz


def _got(spark, edges):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {r["vid"]: r["katz"] for r in katz_centrality(e, ALPHA, R).collect()}


def test_katz_clique_closed_form(spark):
    k5 = [(a, b) for a, b in combinations(range(5), 2)]
    got = _got(spark, k5)
    # w_k = 4^k on K5: the closed form, evaluated in the same order
    expect = 0.0
    for k in range(1, R + 1):
        expect = expect + ALPHA ** k * float(4 ** k)
    assert all(v == expect for v in got.values())


def test_katz_star_and_path_exact(spark):
    for edges in ([(0, i) for i in range(1, 9)],
                  [(1, 2), (2, 3), (3, 4), (4, 5)]):
        got = _got(spark, edges)
        exp = _seq_katz(edges)
        assert got == exp  # EXACT equality — the bitwise contract


def test_katz_er_exact(spark):
    random.seed(13)
    es = list({(random.randrange(40), random.randrange(40)) for _ in range(120)})
    es = [(a, b) for a, b in es if a != b]
    assert _got(spark, es) == _seq_katz(es)


def test_katz_layout_independence_bitwise(spark):
    random.seed(17)
    es = list({(random.randrange(30), random.randrange(30)) for _ in range(90)})
    es = [(a, b) for a, b in es if a != b]
    base = spark.createDataFrame(es, "src long, dst long")
    a = {(r["vid"], r["katz"]) for r in katz_centrality(base, ALPHA, R).collect()}
    b = {(r["vid"], r["katz"]) for r in
         katz_centrality(base.repartition(7, "dst"), ALPHA, R).collect()}
    assert a == b


def test_katz_hub_dominates(spark):
    star = [(0, i) for i in range(1, 12)]
    got = _got(spark, star)
    assert got[0] == max(got.values()) and got[1] == got[11]
