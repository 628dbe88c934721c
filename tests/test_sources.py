"""M0 data layer: dense ids, pages generation, extraction contracts."""

import pytest
from pyspark.sql import functions as F

from parrsb_spark import graphs
from parrsb_spark.functions.ids import dense_ids, dense_ids_window
from parrsb_spark.sources.edges import edges_from_pages, links_from_pages
from parrsb_spark.sources.extract import extract_links_py, extract_text_py
from parrsb_spark.sources.pages import page_html, page_links, page_url, synth_pages


def test_dense_ids_both_impls_agree(spark):
    keys = spark.createDataFrame(
        [(f"u{i % 37}",) for i in range(500)], schema="url string"
    )
    a = {r["url"]: r["vid"] for r in dense_ids(keys).collect()}
    b = {r["url"]: r["vid"] for r in dense_ids_window(keys).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(1, 38))
    # dense, 1-based, ordered by key (reference dense-id contract)
    assert a[min(a)] == 1


def test_extract_text_byte_identical(spark):
    """BASELINE.json input_hint: extracted text byte-identical per url."""
    pages = synth_pages(spark, 64, m=3, seed=42)
    rows = pages.select("url", "html", "text").collect()
    assert len(rows) == 64
    for r in rows:
        assert extract_text_py(bytes(r["html"])) == r["text"]
        assert r["text"].encode() == extract_text_py(bytes(r["html"])).encode()


def test_extract_links_match_generator(spark):
    pages = synth_pages(spark, 64, m=3, seed=42)
    got = {
        r["src_url"]: None for r in links_from_pages(pages).collect()
    }
    # every extracted link equals the generator's deterministic target list
    rows = pages.select("url", "html").collect()
    for r in rows:
        i = int(r["url"].rsplit("p", 1)[1])
        assert extract_links_py(bytes(r["html"]), r["url"]) == page_links(i, 64, 3, 42)


def test_edges_from_pages_is_the_powerlaw_graph(spark):
    """The extracted edge set IS the synthetic graph (FIXTURES.md §1)."""
    n, m, seed = 64, 3, 42
    pages = synth_pages(spark, n, m=m, seed=seed)
    edges, vertices = edges_from_pages(pages)
    vmap = {r["url"]: r["vid"] for r in vertices.collect()}
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    expect = set()
    for i in range(n):
        for t_url in page_links(i, n, m, seed):
            expect.add((vmap[page_url(i)], vmap[t_url]))
    assert got == expect
    # dense 1-based ids
    vids = sorted(vmap.values())
    assert vids == list(range(1, len(vids) + 1))


def test_url_canonicalization():
    html = b'<a href="https://A.test/x/">x</a><a href="https://a.test/x#frag">y</a>'
    links = extract_links_py(html)
    assert links == ["https://a.test/x", "https://a.test/x"]


def test_graph_families_shapes():
    e, coords = graphs.grid2d(4, 3)
    assert len(coords) == 12 and len(e) == 4 * 2 + 3 * 3
    e3, c3 = graphs.grid3d(2, 2, 2)
    assert len(c3) == 8 and len(e3) == 12
    assert len(graphs.ring(5)) == 5
    tc = graphs.two_cliques_bridge(4)
    assert len(tc) == 2 * 6 + 1
    assert len(graphs.star_hub(10)) == 10
    pl = graphs.powerlaw(100, m=2, seed=42)
    assert len(pl) > 50 and all(u != v for u, v in pl)


def test_fuzzy_vertex_ids_matches_union_find(spark):
    """C3 general fuzzy matching (ref con-unique-vertices.c:445-505):
    tolerance-chained clusters along every dimension share one id —
    verified against a brute-force union-find oracle, across a partition
    count that forces range-boundary merges."""
    import numpy as np

    from parrsb_spark.sources.fuzzy import fuzzy_vertex_ids

    rng = np.random.default_rng(11)
    tol = 0.1
    # clusters of near-coincident points + chained runs + isolated points
    pts = []
    base = rng.uniform(0, 100, size=(40, 2))
    vid = 0
    for bx, by in base:
        for _ in range(int(rng.integers(1, 4))):
            pts.append(
                (vid, float(bx + rng.uniform(-0.04, 0.04)), float(by + rng.uniform(-0.04, 0.04)))
            )
            vid += 1
    # a chain: consecutive gaps just under tol (transitive matching)
    for i in range(5):
        pts.append((vid, 200.0 + i * 0.09, 50.0))
        vid += 1
    df = spark.createDataFrame(pts, schema="vid long, x double, y double")
    got = {r["vid"]: r["gid"] for r in fuzzy_vertex_ids(df, ["x", "y"], tol).collect()}
    assert set(got) == {p[0] for p in pts}

    # oracle: union-find with the same per-dimension chaining semantics
    def oracle(pts, tol):
        parent = {p[0]: p[0] for p in pts}
        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a
        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # dim-0 chaining segments
        by_x = sorted(pts, key=lambda p: (p[1], p[0]))
        segs, cur = [], [by_x[0]]
        for prev, nxt in zip(by_x, by_x[1:]):
            if nxt[1] - prev[1] > tol:
                segs.append(cur); cur = []
            cur.append(nxt)
        segs.append(cur)
        # dim-1 chaining within each segment
        for seg in segs:
            by_y = sorted(seg, key=lambda p: (p[2], p[0]))
            for prev, nxt in zip(by_y, by_y[1:]):
                if nxt[2] - prev[2] <= tol:
                    union(prev[0], nxt[0])
        return {p[0]: find(p[0]) for p in pts}

    exp = oracle(pts, tol)
    assert got == exp


def test_host_graph_matches_python_enumeration(spark):
    """Host-level rollup: Spark explode+regexp+count vs the pure-Python
    link generator, multigraph semantics (duplicate links counted)."""
    from collections import Counter

    from parrsb_spark.sources.edges import host_edges_from_pages
    from parrsb_spark.sources.pages import page_links, page_url, synth_pages

    N, M, SEED = 120, 3, 7
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_edges_from_pages(synth_pages(spark, N, m=M, seed=SEED)).collect()
    }

    def host(u):
        return u.split("://", 1)[1].split("/", 1)[0]

    want = Counter()
    for i in range(N):
        for t in page_links(i, N, M, SEED):
            want[(host(page_url(i)), host(t))] += 1
    assert got == dict(want)
