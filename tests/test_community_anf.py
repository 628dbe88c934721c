"""Modularity + ANF kernels vs exact Python oracles.

Modularity: exact decomposition check against a pure-Python Q on
fixture graphs whose community structure is known (two cliques + a
bridge: the clique labeling must score high and a parity labeling must
score negative — the sign discipline a quality gate needs).

ANF: two layers, matching the operator's design split —
(1) the DISTRIBUTED part (the bit_or sketch merge) is exact: masks
    after h hops must equal the OR over the true h-ball of each
    vertex's initial mask, replayed by a pure-Python BFS; and
(2) the ESTIMATOR is statistical: on graphs with closed-form ball
    sizes the k=8 estimate of N(h) must land within FM's expected
    error band, be monotone in h, and reach its fixed point exactly
    at the diameter.
"""

from __future__ import annotations

from collections import Counter, deque
from functools import reduce

import pytest

from parrsb_spark import graphs
from parrsb_spark.operators.anf import (
    anf_masks,
    effective_diameter,
    neighborhood_function,
)
from parrsb_spark.operators.community import modularity, modularity_by_community


def _modularity_np(edges, lab):
    m = len(edges)
    lc, dg = Counter(), Counter()
    for u, v in edges:
        if lab[u] == lab[v]:
            lc[lab[u]] += 1
        dg[lab[u]] += 1
        dg[lab[v]] += 1
    return sum(lc[c] / m - (dg[c] / (2 * m)) ** 2 for c in dg)


def test_modularity_two_cliques(spark):
    e = graphs.two_cliques_bridge(6)  # vertices 1..12, bridge 6-7
    df = graphs.to_df(spark, e)
    lab = {v: (0 if v <= 6 else 1) for v in range(1, 13)}
    labels = spark.createDataFrame(list(lab.items()), "vid long, label long")
    q = modularity(df, labels)
    assert q == pytest.approx(_modularity_np(e, lab), abs=1e-12)
    assert q > 0.4  # strong community structure scores high

    bad = {v: v % 2 for v in range(1, 13)}
    qb = modularity(df, spark.createDataFrame(list(bad.items()), "vid long, label long"))
    assert qb == pytest.approx(_modularity_np(e, bad), abs=1e-12)
    assert qb < 0  # worse-than-random labeling scores negative


def test_modularity_decomposition_exact_counts(spark):
    e = graphs.powerlaw(60, m=2, seed=9)
    df = graphs.to_df(spark, e)
    verts = sorted({u for u, _ in e} | {v for _, v in e})
    lab = {v: v % 3 for v in verts}
    labels = spark.createDataFrame(list(lab.items()), "vid long, label long")
    rows = {r["label"]: r for r in modularity_by_community(df, labels).collect()}
    m = len(e)
    lc, dg, mem = Counter(), Counter(), Counter()
    for u, v in e:
        if lab[u] == lab[v]:
            lc[lab[u]] += 1
        dg[lab[u]] += 1
        dg[lab[v]] += 1
    for v in verts:
        mem[lab[v]] += 1
    assert set(rows) == set(mem)
    for c in mem:
        assert rows[c]["members"] == mem[c]
        assert rows[c]["edges_in"] == lc[c]
        assert rows[c]["deg_sum"] == dg[c]
        assert rows[c]["contrib"] == pytest.approx(lc[c] / m - (dg[c] / (2 * m)) ** 2, abs=1e-15)


def _balls(edges, hops):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    balls = {}
    for s in adj:
        seen = {s}
        frontier = deque([(s, 0)])
        while frontier:
            u, d = frontier.popleft()
            if d == hops:
                continue
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    frontier.append((w, d + 1))
        balls[s] = seen
    return balls


@pytest.mark.parametrize("edges", [graphs.ring(14), graphs.powerlaw(50, m=2, seed=7)])
def test_anf_masks_equal_exact_ball_or(spark, edges):
    """The distributed merge is EXACT: mask(v) after h hops == OR of the
    initial masks over the true h-ball (the same invariant the DuckDB
    oracle replays bit-identically)."""
    hops, k = 3, 4
    df = graphs.to_df(spark, edges)
    init = {
        r["vid"]: tuple(r[f"s{j}"] for j in range(k))
        for r in anf_masks(df, n_hops=0, n_sketches=k).collect()
    }
    got = {
        r["vid"]: tuple(r[f"s{j}"] for j in range(k))
        for r in anf_masks(df, n_hops=hops, n_sketches=k).collect()
    }
    balls = _balls(edges, hops)
    for v, ball in balls.items():
        want = tuple(
            reduce(lambda a, b: a | b, (init[u][j] for u in ball)) for j in range(k)
        )
        assert got[v] == want, v


def test_anf_neighborhood_function_estimates(spark):
    """Estimator quality on the ring: exact N(h) = n*min(2h+1, n); the
    k=8 FM estimate must be monotone, within FM's error band, and hit
    its OR fixed point exactly at the diameter."""
    n = 24
    df = graphs.to_df(spark, graphs.ring(n))
    nf = neighborhood_function(df, max_hops=14, n_sketches=8)
    vals = [x for _, x in nf]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))  # monotone
    for h, est in nf:
        exact = n * min(2 * h + 1, n)
        assert 0.3 * exact <= est <= 3.0 * exact, (h, est, exact)
    # fixed point at the diameter (12 for a 24-ring): last hop repeats
    assert nf[-1][0] <= 13
    ed = effective_diameter(nf, q=0.9)
    assert 4 <= ed <= 13


def test_anf_directed_respects_orientation(spark):
    # path 1→2→3→4 directed: masks flow src→dst (in-ball semantics),
    # so the source's mask never grows and the sink's accumulates all
    # four initial masks
    df = graphs.to_df(spark, [(1, 2), (2, 3), (3, 4)])
    k = 4
    got = {
        r["vid"]: tuple(r[f"s{j}"] for j in range(k))
        for r in anf_masks(df, n_hops=3, n_sketches=k, directed=True).collect()
    }
    init = {
        r["vid"]: tuple(r[f"s{j}"] for j in range(k))
        for r in anf_masks(df, n_hops=0, n_sketches=k, directed=True).collect()
    }
    assert got[1] == init[1]  # nothing reaches the source
    want4 = tuple(
        reduce(lambda a, b: a | b, (init[u][j] for u in (1, 2, 3, 4))) for j in range(k)
    )
    assert got[4] == want4  # sink's in-ball is the whole path


def test_harmonic_centrality_estimates(spark):
    """Estimator vs exact harmonic centrality on a ring (closed form:
    H(v) = 2·Σ_{h=1..n/2-ish} 1/h, identical for every vertex) and
    rank sanity on a star (the hub must dominate every leaf)."""
    from parrsb_spark.operators.anf import harmonic_centrality_estimates

    n = 16
    df = graphs.to_df(spark, graphs.ring(n))
    got = {
        r["vid"]: r["harmonic_est"]
        for r in harmonic_centrality_estimates(df, max_hops=8, n_sketches=8).collect()
    }
    exact = sum(2.0 / h for h in range(1, 8)) + 1.0 / 8  # 2 per hop, 1 antipode
    for v, est in got.items():
        assert 0.3 * exact <= est <= 3.0 * exact, (v, est, exact)

    star = graphs.to_df(spark, graphs.star_hub(20))  # hub=1, leaves 2..21
    hc = {
        r["vid"]: r["harmonic_est"]
        for r in harmonic_centrality_estimates(star, max_hops=3, n_sketches=8).collect()
    }
    assert all(hc[1] > hc[leaf] for leaf in range(2, 22))


def test_anf_nf_bitwise_deterministic_across_partitionings(spark):
    """The per-hop totals must be EXACTLY equal across input layouts:
    the reduction is an exact integer histogram plus one driver-side
    ascending-order fold (a shuffled F.sum of per-vertex floats was
    the linkpred flake shape)."""
    edges = graphs.powerlaw(50, m=3, seed=5)
    base = graphs.to_df(spark, edges)
    a = neighborhood_function(base.repartition(1), max_hops=5, n_sketches=4)
    b = neighborhood_function(
        base.orderBy("dst").repartition(16), max_hops=5, n_sketches=4
    )
    assert a == b  # exact ==, floats included


def test_nf_diameter_query_row_shape(spark):
    from parrsb_spark.entry_queries import ANF_HOPS, q_graph_nf_diameter

    rows = sorted(
        q_graph_nf_diameter(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["h"],
    )
    assert [r["h"] for r in rows] == list(range(ANF_HOPS + 1))
    vals = [r["nf_est"] for r in rows]
    assert all(b >= a for a, b in zip(vals, vals[1:]))  # monotone
    d = {r["d_eff"] for r in rows}
    assert len(d) == 1  # one diameter, constant across hop rows
    assert 0.0 <= d.pop() <= ANF_HOPS
