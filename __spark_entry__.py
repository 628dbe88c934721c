"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query on /root/testdata/sf0.001 — the full
  link-graph pipeline: derive the edge DataFrame, PageRank it, and join
  partition ids from one RSB cut (SURVEY.md §7 M1 flagship).
- ``queries()``: one entry per implemented operator (SURVEY.md §2),
  (spark, sf_dir) → DataFrame.
- ``oracle_sql()``: DuckDB-runnable ANSI SQL producing identical values
  (column names and rounding matched). EVERY queries() entry has an
  oracle: the iterative eigensolver's raw per-vertex values are not
  SQL-expressible (pytest verifies them against numpy at 1e-6,
  tests/test_spectral.py; entry() runs them end-to-end), so the board
  rows assert their SQL-checkable CONTRACTS instead — unit norm /
  orthogonality / sign convention (graph_fiedler_qa), the closed-form
  halving sizes (graph_rsb_sizes), and the genmap --test comm-volume
  gate (graph_rsb_gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parrsb_spark import entry_queries as EQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank + one RSB cut over the derived webgraph at sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    edges = EQ.bipartite_edges(spark, sf_dir)

    from parrsb_spark.config import EngineOptions
    from parrsb_spark.operators.pagerank import pagerank
    from parrsb_spark.operators.rsb import rsb_partition

    pr = pagerank(edges, fixed_iters=8)
    opts = EngineOptions(rsb_max_iter=20, rsb_max_passes=2, rsb_tol=1e-5)
    parts = rsb_partition(edges, 2, opts=opts)
    return pr.join(parts, "vid").select("vid", F.round("pr", 10).alias("pr"), "part")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return EQ.queries()


def oracle_sql() -> dict[str, str]:
    return EQ.oracle_sql()
