"""Deterministic synthetic `pages` table (schema mandated by
BASELINE.json input_hint):

    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

Generation is fully data-parallel (spark.range → mapInPandas): page i's
outlinks, filler text and bytes are pure functions of (seed, i), so any
scale regenerates bit-identically — the engine's version of the
reference's deterministic init contract (ref
/root/reference/src/fiedler.c:574-578 deterministic initial vector).

Outlink structure: a "copy-model" power-law graph — page i draws m
targets t = floor((h/H)^2 * i) with h = md5(seed,i,k); the quadratic
bias toward early pages yields a heavy-tailed in-degree (the hub-skew
regime the north rule requires salting/AQE for). FIXTURES.md §3
`powerlaw_s42` family.
"""

from __future__ import annotations

import datetime
import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from parrsb_spark.sources.extract import extract_text_py

_EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
_LANGS = ["en", "de", "fr"]
_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
]


def _h64(*parts: object) -> int:
    raw = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(raw).digest()[:8], "big")


def page_url(i: int) -> str:
    return f"https://site{i % 97}.test/p{i}"


def page_links(i: int, n: int, m: int, seed: int) -> list[str]:
    """Deterministic outlinks of page i (power-law targets, no self-links)."""
    if i == 0:
        return []
    out = []
    for k in range(m):
        h = _h64(seed, i, k)
        frac = (h % 10_000_019) / 10_000_019.0
        t = int(frac * frac * i)  # quadratic bias → heavy-tailed in-degree
        if t != i:
            out.append(page_url(t))
    return out


def page_html(i: int, n: int, m: int, seed: int) -> bytes:
    words = [_WORDS[_h64(seed, i, "w", j) % len(_WORDS)] for j in range(12)]
    links = page_links(i, n, m, seed)
    anchors = "".join(f'<a href="{u}">link{j}</a> ' for j, u in enumerate(links))
    html = (
        f"<html><head><title>page {i}</title></head><body>"
        f"<p>{' '.join(words)}</p>{anchors}</body></html>"
    )
    return html.encode("utf-8")


def page_text(i: int, n: int, m: int, seed: int) -> str:
    return extract_text_py(page_html(i, n, m, seed))


def synth_pages(
    spark: SparkSession, n: int, m: int = 4, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic pages table (Arrow-batched generation)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            htmls = [page_html(int(i), n, m, seed) for i in ids]
            yield pd.DataFrame(
                {
                    "url": [page_url(int(i)) for i in ids],
                    "warc_ts": [_EPOCH + datetime.timedelta(seconds=int(i)) for i in ids],
                    "html": htmls,
                    "text": [extract_text_py(h) for h in htmls],
                    "lang": [_LANGS[int(i) % 3] for i in ids],
                }
            )

    rng = spark.range(n, numPartitions=partitions or min(32, max(1, n // 2048 or 1)))
    return rng.mapInPandas(
        gen, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
