"""Property-based tests (hypothesis) for the pure extraction layer."""

from hypothesis import given, settings
from hypothesis import strategies as st

from parrsb_spark.sources.extract import canonicalize_url, extract_links_py, extract_text_py


@given(st.binary(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_extract_text_total(html):
    """Extractor never raises and is deterministic on arbitrary bytes."""
    a = extract_text_py(html)
    b = extract_text_py(html)
    assert a == b
    assert "\n" not in a and "  " not in a  # whitespace collapsed


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(url):
    once = canonicalize_url(url)
    assert canonicalize_url(once) == once


@given(st.lists(st.sampled_from(["https://a.test/x", "https://b.test/y/", "HTTP://C.test/z#f"]), max_size=8))
@settings(max_examples=100, deadline=None)
def test_extract_links_roundtrip(urls):
    html = "".join(f'<a href="{u}">l</a>' for u in urls).encode()
    got = extract_links_py(html)
    assert got == [canonicalize_url(u) for u in urls]
