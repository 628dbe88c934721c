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
