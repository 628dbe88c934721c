"""Alias contraction + dense renumbering.

Reference: periodic-face vertex aliasing — iterated gs-min over
(orig → min) pairs until fixpoint (`renumberPeriodicVertices`, ref
/root/reference/src/con-periodic.c:64-105), then global dense renumber
(`compressPeriodicVertices`, ref src/con-periodic.c:24-55).

Webgraph analogue: URL canonicalization aliases (redirect pairs u ≡ v)
contracted onto one vertex id. The fixpoint is exactly connected
components over the alias pairs (min-label), so we reuse that kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parrsb_spark.functions.ids import dense_ids
from parrsb_spark.operators.components import connected_components
from parrsb_spark.sources.edges import vertices_from_edges


def contract_aliases(edges: DataFrame, aliases: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Contract alias pairs (u ≡ v) into canonical (min-id) vertices.

    Returns (edges', mapping) where mapping = (vid, canon). Self-loops
    created by contraction are dropped; duplicate edges deduped."""
    all_verts = vertices_from_edges(edges)
    labels = connected_components(aliases, vertices=vertices_from_edges(aliases))
    mapping = all_verts.join(labels, "vid", "left").select(
        "vid", F.coalesce("comp", F.col("vid")).alias("canon")
    )
    e2 = (
        edges.join(mapping.withColumnRenamed("vid", "src").withColumnRenamed("canon", "csrc"), "src")
        .join(mapping.withColumnRenamed("vid", "dst").withColumnRenamed("canon", "cdst"), "dst")
        .select(F.col("csrc").alias("src"), F.col("cdst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return e2, mapping


def dense_renumber(df: DataFrame, col: str = "comp", out_col: str = "dense") -> DataFrame:
    """Dense 1-based renumbering of a label column, order-preserving
    (ref compressPeriodicVertices run-length renumber + prefix scan).

    Distributed form: number the *distinct* labels with the scalable
    range-partitioned prefix-scan (`dense_ids`), then join the mapping
    back — no global no-partition window, so no single-task funnel at
    10^12 rows. The mapping side has one row per distinct label (tiny
    relative to df), so AQE will broadcast it when small.
    """
    mapping = dense_ids(df.select(col), key_col=col, out_col=out_col)
    cols = list(df.columns)
    return df.join(mapping, col).select(*cols, out_col)
