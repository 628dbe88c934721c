"""Betweenness vs an exact sequential Brandes reference.

Closed forms hit the definition: a path (interior vertices carry all
pair dependencies), a star (the hub carries everything), a cycle
(symmetric split), and the diamond (1-2/3-4 double shortest path —
the σ-ratio split a naive single-path accumulation gets wrong). The
ER fixture exercises multi-level DAGs with shared predecessors; the
layout test asserts the bitwise ordered-fold contract."""

from __future__ import annotations

import random
from collections import defaultdict, deque

import pytest
from pyspark.sql import functions as F

from parrsb_spark.operators.betweenness import betweenness


def _brandes(edges, sources):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    bc = defaultdict(float)
    for s in sources:
        S, P = [], defaultdict(list)
        sigma, dist = defaultdict(int), {s: 0}
        sigma[s] = 1
        Q = deque([s])
        while Q:
            v = Q.popleft()
            S.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    Q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    P[w].append(v)
        delta = defaultdict(float)
        while S:
            w = S.pop()
            for v in P[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return dict(bc)


def _check(spark, edges, k=4, max_hops=10):
    e = spark.createDataFrame(edges, "src long, dst long")
    verts = sorted({v for p in edges for v in p})
    srcs = verts[:k]
    sdf = spark.createDataFrame([(v,) for v in srcs], "vid long")
    got = {r["vid"]: r["bc"] for r in betweenness(e, sdf, max_hops=max_hops).collect()}
    exp = _brandes(edges, srcs)
    for v in set(got) | set(exp):
        assert abs(got.get(v, 0.0) - exp.get(v, 0.0)) < 1e-9, (v, got.get(v), exp.get(v))
    return got


def test_bc_path_and_star(spark):
    got = _check(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], k=5)
    assert got[1] == 0.0 and got[3] > got[2] - 1e-12
    got = _check(spark, [(0, i) for i in range(1, 8)], k=8)
    assert got[0] == max(got.values())


def test_bc_diamond_sigma_split(spark):
    # two shortest 1->4 paths: δ splits by σ-ratio through 2 and 3
    _check(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)], k=5)


def test_bc_cycle(spark):
    _check(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0)], k=6)


def test_bc_er_multi_dag(spark):
    random.seed(5)
    es = list({(random.randrange(25), random.randrange(25)) for _ in range(60)})
    es = [(a, b) for a, b in es if a != b]
    _check(spark, es, k=6)


def test_bc_layout_independence_bitwise(spark):
    random.seed(9)
    es = list({(random.randrange(30), random.randrange(30)) for _ in range(70)})
    es = [(a, b) for a, b in es if a != b]
    base = spark.createDataFrame(es, "src long, dst long")
    srcs = spark.createDataFrame([(v,) for v in sorted({x for p in es for x in p})[:4]], "vid long")
    a = {(r["vid"], r["bc"]) for r in betweenness(base, srcs).collect()}
    b = {(r["vid"], r["bc"]) for r in
         betweenness(base.repartition(7, "dst"), srcs).collect()}
    assert a == b  # EXACT float equality — the ordered-fold contract


def test_bc_disconnected_scores_zero(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    e = spark.createDataFrame(edges, "src long, dst long")
    srcs = spark.createDataFrame([(1,)], "vid long")
    got = {r["vid"]: r["bc"] for r in betweenness(e, srcs, max_hops=6).collect()}
    # single source 1 on path 1-2-3: δ(2) = σ2/σ3 · (1+δ3) = 1.0
    assert got[10] == 0.0 and got[11] == 0.0 and got[2] == 1.0


def _brandes_edges(edges, sources):
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    eb = defaultdict(float)
    for s in sources:
        S, P = [], defaultdict(list)
        sigma, dist = defaultdict(int), {s: 0}
        sigma[s] = 1
        Q = deque([s])
        while Q:
            v = Q.popleft()
            S.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    Q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    P[w].append(v)
        delta = defaultdict(float)
        while S:
            w = S.pop()
            for v in P[w]:
                t = sigma[v] / sigma[w] * (1 + delta[w])
                delta[v] += t
                eb[(min(v, w), max(v, w))] += t
    return dict(eb)


def _check_edges(spark, edges, k=4, max_hops=10):
    from parrsb_spark.operators.betweenness import edge_betweenness

    e = spark.createDataFrame(edges, "src long, dst long")
    verts = sorted({v for p in edges for v in p})
    sdf = spark.createDataFrame([(v,) for v in verts[:k]], "vid long")
    got = {(r["u"], r["v"]): r["ebc"]
           for r in edge_betweenness(e, sdf, max_hops=max_hops).collect()}
    exp = _brandes_edges(edges, verts[:k])
    for p in set(got) | set(exp):
        assert abs(got.get(p, 0.0) - exp.get(p, 0.0)) < 1e-9, (p, got.get(p), exp.get(p))
    return got


def test_edge_bc_bridge_dominates(spark):
    # two triangles joined by a bridge: the bridge carries every
    # cross-component pair — the Girvan-Newman cut signal
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    got = _check_edges(spark, edges, k=6)
    assert got[(3, 4)] == max(got.values())


def test_edge_bc_diamond_and_er(spark):
    _check_edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)], k=5)
    random.seed(21)
    es = list({(random.randrange(22), random.randrange(22)) for _ in range(55)})
    es = [(a, b) for a, b in es if a != b]
    _check_edges(spark, es, k=5)


def test_edge_bc_layout_independence_bitwise(spark):
    from parrsb_spark.operators.betweenness import edge_betweenness

    random.seed(23)
    es = list({(random.randrange(25), random.randrange(25)) for _ in range(60)})
    es = [(a, b) for a, b in es if a != b]
    base = spark.createDataFrame(es, "src long, dst long")
    srcs = spark.createDataFrame(
        [(v,) for v in sorted({x for p in es for x in p})[:4]], "vid long")
    a = {tuple(r) for r in edge_betweenness(base, srcs).collect()}
    b = {tuple(r) for r in edge_betweenness(base.repartition(5, "dst"), srcs).collect()}
    assert a == b


def test_star_hub_two_level_fold(spark, monkeypatch):
    """r6 VERDICT #4: the backward fold's per-(s, u) successor array is
    capped in code. Force the two-level path with a tiny FOLD_CAP on a
    star hub (hub out-degree far above the cap) and check it against
    the flat fold's values (allclose — the two-level association is a
    different, equally valid float grouping) and against itself under a
    different input layout (bitwise — determinism is unconditional)."""
    import parrsb_spark.operators.betweenness as B

    n_leaves = 40
    star = [(0, i) for i in range(1, n_leaves + 1)]
    # a tail behind the hub so the hub sits MID-DAG with delta > 0
    tail = [(n_leaves + 1, 0)]
    df = spark.createDataFrame(star + tail, "src long, dst long")
    srcs = spark.createDataFrame([(n_leaves + 1,), (0,)], "vid long")
    flat = {r["vid"]: r["bc"] for r in B.betweenness(df, srcs).collect()}
    monkeypatch.setattr(B, "FOLD_CAP", 8)
    capped = {r["vid"]: r["bc"] for r in B.betweenness(df, srcs).collect()}
    capped2 = {
        r["vid"]: r["bc"]
        for r in B.betweenness(df.repartition(7, "dst"), srcs).collect()
    }
    assert capped == capped2  # bitwise deterministic under the cap
    assert flat.keys() == capped.keys()
    for v in flat:
        assert abs(flat[v] - capped[v]) <= 1e-9 * max(1.0, abs(flat[v])), v
