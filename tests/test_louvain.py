"""Synchronous Louvain-sweep vs a brute Python replay of the same
recurrence, plus structural community checks.

The brute oracle replays the EXACT contract (singleton init, all
vertices move simultaneously to the max-gain neighbor community, ties
to the smallest id) — the same recurrence the DuckDB oracle unrolls —
so equality is exact, not approximate. The structural test uses two
cliques joined by one bridge: after the sweep the partition must keep
each clique within one community (no community spans the bridge
except via its endpoints' own cliques) and reach positive modularity
from the negative singleton start.
"""

from __future__ import annotations

from parrsb_spark import graphs
from parrsb_spark.operators.community import louvain_moves, modularity


def _brute(edges, rounds):
    adj: dict[int, dict[int, int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, {})[b] = 1
        adj.setdefault(b, {})[a] = 1
    deg = {v: len(ns) for v, ns in adj.items()}
    m2 = float(sum(deg.values()))
    lab = {v: v for v in adj}
    for _ in range(rounds):
        dc: dict[int, int] = {}
        for v in adj:
            dc[lab[v]] = dc.get(lab[v], 0) + deg[v]
        new = {}
        for v in adj:
            kin: dict[int, int] = {}
            for u in adj[v]:
                kin[lab[u]] = kin.get(lab[u], 0) + 1
            best = None
            for cand, k in kin.items():
                corr = float(deg[v]) if cand == lab[v] else 0.0
                g = float(k) - float(deg[v]) * (float(dc[cand]) - corr) / m2
                key = (g, -cand)
                if best is None or key > best[0]:
                    best = (key, cand)
            new[v] = best[1]
        lab = new
    return lab


def test_louvain_matches_brute_replay(spark):
    for seed in (3, 7):
        edges = graphs.powerlaw(50, m=3, seed=seed)
        df = graphs.to_df(spark, edges)
        got = {r["vid"]: r["community"] for r in louvain_moves(df, n_rounds=3).collect()}
        assert got == _brute(edges, 3)


def test_louvain_two_cliques_structure(spark):
    edges = graphs.two_cliques_bridge(6)
    df = graphs.to_df(spark, edges)
    labels = louvain_moves(df, n_rounds=3)
    got = {r["vid"]: r["community"] for r in labels.collect()}
    # communities never span the bridge: vertices of clique A (1..6)
    # and clique B (7..12) share no community id
    a = {got[v] for v in range(1, 7)}
    b = {got[v] for v in range(7, 13)}
    assert a.isdisjoint(b)
    q = modularity(
        df.selectExpr("src", "dst"),
        labels.selectExpr("vid", "community AS label"),
    )
    assert q > 0.3  # singleton start is negative; the sweep must climb


def test_louvain_exact_across_partitionings(spark):
    edges = graphs.powerlaw(40, m=4, seed=1)
    base = graphs.to_df(spark, edges)
    a = {r["vid"]: r["community"] for r in louvain_moves(base.repartition(1), 3).collect()}
    b = {
        r["vid"]: r["community"]
        for r in louvain_moves(base.orderBy("dst").repartition(16), 3).collect()
    }
    assert a == b
