"""pages → edges(src BIGINT, dst BIGINT) + vertices(vid, url).

The full gencon-analogue pipeline (SURVEY.md §2.C):
  C1 explode:      pages → (url, target_url) link rows
  C3 dedup:        exact canonical-URL matching (webgraph's fuzzy-vertex dedup)
  C4 dense ids:    deterministic dense 1-based vids
  C5 send-back:    join vids back to the link rows

Scale notes: the links explode is pure JVM (explode over an Arrow-UDF
array column); the two vid joins are plain equi-joins on url — Catalyst
broadcasts the vertex map while it is small and sort-merge-joins at
scale; AQE splits skewed hub URLs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parrsb_spark.functions.ids import dense_ids
from parrsb_spark.sources.extract import extract_links_udf


def links_from_pages(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) link rows (C1 explode)."""
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(extract_links_udf(F.col("html"), F.col("url"))).alias("dst_url"),
        )
    )


def edges_from_pages(pages: DataFrame, dedup: bool = True) -> tuple[DataFrame, DataFrame]:
    """Returns (edges(src,dst), vertices(vid,url)).

    Vertices = union of link endpoints and page urls, densely numbered.
    """
    links = links_from_pages(pages)
    urls = (
        pages.select(F.col("url"))
        .union(links.select(F.col("dst_url").alias("url")))
        .union(links.select(F.col("src_url").alias("url")))
    )
    vertices = dense_ids(urls, key_col="url", out_col="vid")
    e = (
        links.join(vertices.withColumnRenamed("url", "src_url").withColumnRenamed("vid", "src"), "src_url")
        .join(vertices.withColumnRenamed("url", "dst_url").withColumnRenamed("vid", "dst"), "dst_url")
        .select("src", "dst")
    )
    if dedup:
        e = e.distinct()
    return e, vertices


def host_of_url(col: Column) -> Column:
    """Host part of an URL column (scheme://HOST/...), JVM-side regexp."""
    return F.regexp_extract(col, r"^[a-z]+://([^/]+)", 1)


def host_edges_from_pages(pages: DataFrame) -> DataFrame:
    """(src_host, dst_host, weight) — host-level contraction of the page
    link graph (the CommonCrawl webgraph rollup: hosts as supernodes,
    weight = number of page-level links between them, intra-host links
    kept as self-edges). One explode + one map-side-combinable count
    aggregate; the host key space is orders smaller than the URL space,
    so downstream host-level kernels (PageRank etc.) run on a contracted
    graph — the C7 min-label contraction's weighted sibling."""
    links = links_from_pages(pages)
    return (
        links.select(
            host_of_url(F.col("src_url")).alias("src_host"),
            host_of_url(F.col("dst_url")).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("weight"))
    )


def vertices_from_edges(edges: DataFrame) -> DataFrame:
    """(vid) — all endpoint ids of an edge DF."""
    return (
        edges.select(F.col("src").alias("vid"))
        .union(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
