from parrsb_spark.sources.pages import synth_pages, page_html, page_text, page_links
from parrsb_spark.sources.extract import extract_text_udf, extract_links_udf, extract_text_py, extract_links_py
from parrsb_spark.sources.edges import edges_from_pages, vertices_from_edges
from parrsb_spark.sources.fuzzy import fuzzy_vertex_ids, min_neighbor_distance
from parrsb_spark.sources.tables import load_tables, TABLES

__all__ = [
    "synth_pages",
    "page_html",
    "page_text",
    "page_links",
    "extract_text_udf",
    "extract_links_udf",
    "extract_text_py",
    "extract_links_py",
    "edges_from_pages",
    "vertices_from_edges",
    "fuzzy_vertex_ids",
    "min_neighbor_distance",
    "load_tables",
    "TABLES",
]
