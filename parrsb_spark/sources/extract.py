"""HTML → text / links extraction (Arrow-vectorized pandas UDFs).

Contract (BASELINE.json input_hint): extracted text must be
byte-identical per url to the oracle extractor. We guarantee that by
construction: the pure-Python functions below ARE the oracle, and the
Spark UDFs are thin Arrow-batched wrappers around them (no per-row
Python at the Spark API surface — batches come in as pandas Series).

Reference parity: this is the engine's analogue of gencon's mesh →
connectivity stage (vertex explode, ref /root/reference/src/con.c:14-50),
with URL canonicalization standing in for fuzzy vertex matching
(ref /root/reference/src/con-unique-vertices.c:445-505 — exact keys
replace coordinate tolerance for a webgraph).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_HREF_RE = re.compile(rb'href="([^"]*)"')


def extract_text_py(html: bytes | None) -> str | None:
    """Oracle text extractor: strip tags, collapse whitespace, strip ends."""
    if html is None:
        return None
    no_tags = _TAG_RE.sub(b" ", html)
    text = no_tags.decode("utf-8", errors="replace")
    return _WS_RE.sub(" ", text).strip()


def canonicalize_url(url: str) -> str:
    """URL canonicalization — the webgraph analogue of periodic-face alias
    matching (ref /root/reference/src/con-periodic.c:107-172): trailing
    slash, fragment, scheme-case all collapse to one canonical key."""
    url = url.strip()
    if "#" in url:
        # dropping the fragment can expose trailing whitespace ("x #y")
        url = url[: url.index("#")].rstrip()
    if url.endswith("/"):
        # dropping the slash can expose trailing whitespace ("x /")
        url = url[:-1].rstrip()
    scheme, sep, rest = url.partition("://")
    if not sep:
        return url
    host, slash, path = rest.partition("/")
    return scheme.lower() + sep + host.lower() + slash + path


def extract_links_py(html: bytes | None, base_url: str | None = None) -> list[str]:
    """Oracle link extractor: href values, canonicalized, in document order."""
    if html is None:
        return []
    out = []
    for m in _HREF_RE.finditer(html):
        href = m.group(1).decode("utf-8", errors="replace")
        if not href or href.startswith("javascript:"):
            continue
        if "://" not in href and base_url:
            href = base_url.rstrip("/") + "/" + href.lstrip("/")
        out.append(canonicalize_url(href))
    return out


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    return pd.Series([extract_links_py(h, b) for h, b in zip(html, base_url)])
