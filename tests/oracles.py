"""Single-node numpy reference implementations (SURVEY.md §5 oracles).

Deliberately independent of the Spark operators: plain dict/array code,
so a bug can't be shared between engine and oracle.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def _vertices(edges):
    vs = set()
    for u, v in edges:
        vs.add(u)
        vs.add(v)
    return sorted(vs)


def _sym_adj(edges):
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    return adj


def pagerank_np(edges, damping=0.85, iters=40, tol=None):
    verts = _vertices(edges)
    n = len(verts)
    idx = {v: i for i, v in enumerate(verts)}
    out = Counter(u for u, _ in edges)
    pr = {v: 1.0 / n for v in verts}
    in_nbrs = defaultdict(list)
    for u, v in edges:
        in_nbrs[v].append(u)
    for _ in range(iters):
        dangling = sum(p for v, p in pr.items() if out[v] == 0)
        base = (1 - damping) / n + damping * dangling / n
        new = {}
        for v in verts:
            s = sum(pr[u] / out[u] for u in in_nbrs[v])
            new[v] = base + damping * s
        if tol is not None and sum(abs(new[v] - pr[v]) for v in verts) < tol:
            pr = new
            break
        pr = new
    return pr


def components_np(edges, vertices=None):
    """(vid → min vid of component)."""
    adj = _sym_adj(edges)
    verts = vertices or _vertices(edges)
    label = {}
    for v in sorted(verts):
        if v in label:
            continue
        stack, seen = [v], {v}
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        for u in seen:
            label[u] = v
    return label


def triangles_np(edges):
    """(vid → triangle participation count)."""
    adj = _sym_adj(edges)
    verts = _vertices(edges)
    tri = {v: 0 for v in verts}
    for u in verts:
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    tri[u] += 1
                    tri[v] += 1
                    tri[w] += 1
    return tri


def lcc_np(edges):
    """(vid → (tri, deg, lcc)); lcc = 2*tri/(deg*(deg-1)), 0.0 if deg < 2."""
    tri = triangles_np(edges)
    adj = _sym_adj(edges)
    out = {}
    for v in _vertices(edges):
        d = len(adj[v])
        out[v] = (tri[v], d, 2.0 * tri[v] / (d * (d - 1)) if d >= 2 else 0.0)
    return out


def labelprop_np(edges, n_iter=5):
    """Deterministic synchronous LP: argmax count, ties → smallest label."""
    adj = _sym_adj(edges)
    verts = _vertices(edges)
    label = {v: v for v in verts}
    for _ in range(n_iter):
        new = {}
        for v in verts:
            if not adj[v]:
                new[v] = label[v]
                continue
            cnt = Counter(label[u] for u in adj[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        label = new
    return label


def laplacian_np(edges, verts=None):
    verts = verts or _vertices(edges)
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    L = np.zeros((n, n))
    seen = set()
    for u, v in edges:
        if u == v:
            continue
        key = (min(u, v), max(u, v))
        if key in seen:
            continue
        seen.add(key)
        i, j = idx[u], idx[v]
        L[i, j] -= 1
        L[j, i] -= 1
        L[i, i] += 1
        L[j, j] += 1
    return L, verts


def fiedler_np(edges):
    """(vid → fiedler entry), unit norm, sign-fixed at the smallest vid
    with |f| > 1e-9. Assumes connected graph and simple λ₂."""
    L, verts = laplacian_np(edges)
    vals, vecs = np.linalg.eigh(L)
    f = vecs[:, 1]
    for i in range(len(verts)):
        if abs(f[i]) > 1e-9:
            if f[i] < 0:
                f = -f
            break
    return dict(zip(verts, f)), float(vals[1])


def hits_np(edges, n_iter=6):
    """(vid → (hub, auth)) after n_iter normalized iterations, h₀ = 1.
    Multigraph semantics: parallel edges contribute once per copy."""
    verts = _vertices(edges)
    h = {v: 1.0 for v in verts}
    a = {v: 0.0 for v in verts}
    for _ in range(n_iter):
        a = {v: 0.0 for v in verts}
        for u, v in edges:
            a[v] += h[u]
        nrm = np.sqrt(sum(x * x for x in a.values()))
        a = {v: (x / nrm if nrm > 0 else 0.0) for v, x in a.items()}
        h = {v: 0.0 for v in verts}
        for u, v in edges:
            h[u] += a[v]
        nrm = np.sqrt(sum(x * x for x in h.values()))
        h = {v: (x / nrm if nrm > 0 else 0.0) for v, x in h.items()}
    return {v: (h[v], a[v]) for v in verts}


def kcore_np(edges, k):
    """(vid → degree inside the k-core) for k-core members only, on the
    symmetrized simple graph (self-loops dropped)."""
    adj = _sym_adj(edges)
    alive = set(_vertices(edges))
    while True:
        deg = {v: len(adj[v] & alive) for v in alive}
        nxt = {v for v in alive if deg[v] >= k}
        if nxt == alive:
            return {v: deg[v] for v in alive} if alive else {}
        alive = nxt


def ppr_np(edges, seeds, damping=0.85, iters=8):
    """Personalized PageRank (random walk with restart to uniform-on-S)."""
    verts = _vertices(edges)
    seeds = set(seeds)
    ns = len(seeds)
    out = Counter(u for u, _ in edges)
    tele = {v: (1.0 / ns if v in seeds else 0.0) for v in verts}
    pr = dict(tele)
    in_nbrs = defaultdict(list)
    for u, v in edges:
        in_nbrs[v].append(u)
    for _ in range(iters):
        dangling = sum(p for v, p in pr.items() if out[v] == 0)
        new = {}
        for v in verts:
            s = sum(pr[u] / out[u] for u in in_nbrs[v])
            new[v] = ((1 - damping) + damping * dangling) * tele[v] + damping * s
        pr = new
    return pr


def sssp_np(wedges, seeds, max_rounds=10**9, directed=False):
    """Bellman-Ford over (u, v, w) triples: vid → best ≤max_rounds-edge
    path weight from the nearest seed; unreachable vertices absent."""
    rel = []
    for u, v, w in wedges:
        if u != v:
            rel.append((u, v, w))
            if not directed:
                rel.append((v, u, w))
    dist = {s: 0 for s in set(seeds)}
    for _ in range(max_rounds):
        new = dict(dist)
        for u, v, w in rel:
            if u in dist and (v not in new or dist[u] + w < new[v]):
                new[v] = dist[u] + w
        if new == dist:
            break
        dist = new
    return dist


def bfs_np(edges, seeds, max_hops=10**9, directed=False):
    """Multi-source BFS hop distances; only reachable vertices appear."""
    if directed:
        adj = defaultdict(set)
        for u, v in edges:
            if u != v:
                adj[u].add(v)
    else:
        adj = _sym_adj(edges)
    dist = {s: 0 for s in set(seeds)}
    frontier = set(dist)
    h = 0
    while frontier and h < max_hops:
        h += 1
        frontier = {w for v in frontier for w in adj[v] if w not in dist}
        for w in frontier:
            dist[w] = h
    return dist
