"""Greedy coloring vs a sequential reference, closed forms, and
bitwise layout-independence.

The "jp" schedule must EQUAL the sequential greedy coloring along the
(p, vid) priority order — asserted against a 10-line Python replay on
closed-form graphs and a seeded ER graph. The "spec" schedule is
schedule-defined, so its contracts are properness, the greedy bound
(color ≤ degree), clique serialization (K_c needs exactly c rounds
and c colors), and exact partial-result equality at ANY round bound
under different partition layouts (the any-round-bound contract the
oracle row relies on)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from parrsb_spark.operators.coloring import greedy_coloring
from parrsb_spark.operators.mis import KNUTH_MULT, PRIO_MOD

K4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
STAR = [(0, i) for i in range(1, 20)]
CYCLE6 = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0)]


def _seq_greedy(edges):
    """Sequential greedy coloring in ascending (p, vid) order."""
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    col = {}
    for v in sorted(adj, key=lambda v: ((v * KNUTH_MULT) % PRIO_MOD, v)):
        used = {col[u] for u in adj[v] if u in col}
        c = 0
        while c in used:
            c += 1
        col[v] = c
    return col


def _er(n=60, m=150, seed=7):
    random.seed(seed)
    es = list({(random.randrange(n), random.randrange(n)) for _ in range(m)})
    return [(a, b) for a, b in es if a != b]


@pytest.mark.parametrize("name,edges", [("k4", K4), ("star", STAR),
                                        ("cycle6", CYCLE6), ("er60", _er())])
def test_jp_equals_sequential_greedy(spark, name, edges):
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["vid"]: r["color"] for r in
           greedy_coloring(e, max_rounds=256, method="jp").collect()}
    assert got == _seq_greedy(edges)


@pytest.mark.parametrize("name,edges", [("k4", K4), ("star", STAR),
                                        ("cycle6", CYCLE6), ("er60", _er())])
def test_spec_proper_and_bounded(spark, name, edges):
    e = spark.createDataFrame(edges, "src long, dst long")
    rows = greedy_coloring(e, max_rounds=64).collect()
    got = {r["vid"]: r["color"] for r in rows}
    deg = {}
    for a, b in edges:
        if a != b:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
    assert all(c >= 0 for c in got.values())  # converged
    assert all(got[a] != got[b] for a, b in edges if a != b)  # proper
    assert all(got[v] <= deg[v] for v in got)  # greedy bound


def test_spec_clique_serializes(spark):
    """K_c: every uncolored vertex picks the same mex each round, so
    exactly one commits per round — c rounds, colors 0..c-1."""
    kc = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    e = spark.createDataFrame(kc, "src long, dst long")
    rows = greedy_coloring(e, max_rounds=16).collect()
    assert sorted(r["color"] for r in rows) == list(range(6))
    assert sorted(r["round"] for r in rows) == list(range(1, 7))


def test_spec_any_round_bound_layout_independence(spark):
    """Partial 3-round output is exactly equal under different input
    layouts, INCLUDING the (-1, -1) undecided rows — the contract the
    40-round unrolled oracle row relies on."""
    edges = _er()
    base = spark.createDataFrame(edges, "src long, dst long")
    outs = []
    for df in (base, base.repartition(5, "dst"),
               base.repartition(1).sortWithinPartitions(F.desc("src"))):
        outs.append({tuple(r) for r in greedy_coloring(df, max_rounds=3).collect()})
    assert outs[0] == outs[1] == outs[2]
    assert any(c == -1 for _, c, _ in outs[0])  # genuinely partial at 3


def test_bad_method_raises(spark):
    e = spark.createDataFrame(K4, "src long, dst long")
    with pytest.raises(ValueError):
        greedy_coloring(e, method="nope")
