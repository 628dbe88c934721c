"""Partition-quality statistics — THE acceptance metrics.

Reference: `parrsb_get_part_stat` (ref /root/reference/src/helpers.c:132-224)
reports per-rank neighbor counts and message volumes; the `genmap --test`
gate asserts total communication volume non-increasing after RSB
(ref /root/reference/examples/genmap.c:75-78). `parrsb_get_neighbors`
(ref src/statistics.c:17-113) is the per-partition neighbor census.

Engine semantics over an edge DF + part map:
- edge_cut:     # undirected edges with endpoints in different parts
- comm_volume:  Σ_v (#distinct parts among v ∪ neighbors(v)) − 1
                (replication factor — the data each vertex must ship)
- neighbor_census: per part, #distinct adjacent parts
- block_partition: contiguous-vid-range map = the reference's
  pre-partition block distribution (load_balance, ref src/parrsb.c:103-166),
  the "before" side of the quality gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parrsb_spark.functions.ids import dense_ids
from parrsb_spark.functions.spmv import symmetrize
from parrsb_spark.sources.edges import vertices_from_edges


def _tag(edges: DataFrame, parts: DataFrame) -> DataFrame:
    m = parts.select("vid", "part")
    return (
        edges.join(m.withColumnRenamed("vid", "src").withColumnRenamed("part", "p1"), "src")
        .join(m.withColumnRenamed("vid", "dst").withColumnRenamed("part", "p2"), "dst")
    )


def edge_cut(edges: DataFrame, parts: DataFrame) -> int:
    und = symmetrize(edges).filter(F.col("src") < F.col("dst"))
    return _tag(und, parts).filter(F.col("p1") != F.col("p2")).count()


def comm_volume(edges: DataFrame, parts: DataFrame) -> int:
    sym = symmetrize(edges)
    tagged = _tag(sym, parts)
    incident = tagged.select(F.col("src").alias("vid"), F.col("p2").alias("p")).union(
        parts.select("vid", F.col("part").alias("p"))
    )
    per_v = incident.distinct().groupBy("vid").agg((F.count("*") - 1).alias("extra"))
    row = per_v.agg(F.sum("extra")).collect()[0][0]
    return int(row or 0)


def neighbor_census(edges: DataFrame, parts: DataFrame) -> DataFrame:
    """(part, n_nbr_parts) — distinct adjacent partitions per partition."""
    sym = symmetrize(edges)
    tagged = _tag(sym, parts).filter(F.col("p1") != F.col("p2"))
    return (
        tagged.select(F.col("p1").alias("part"), F.col("p2").alias("nbr"))
        .distinct()
        .groupBy("part")
        .agg(F.count("*").alias("n_nbr_parts"))
    )


def partition_sizes(parts: DataFrame) -> DataFrame:
    return parts.groupBy("part").agg(F.count("*").alias("n"))


def block_partition(vertices_or_edges: DataFrame, k: int) -> DataFrame:
    """Contiguous ⌈n/k⌉ blocks by vid order — the pre-partition baseline.

    Distributed: ranks come from the scalable range-partitioned numbering
    (`dense_ids`), not a global no-partition window, so no single-task
    funnel at scale."""
    verts = (
        vertices_or_edges.select("vid")
        if "vid" in vertices_or_edges.columns
        else vertices_from_edges(vertices_or_edges)
    )
    n = verts.count()
    block = -(-n // k)  # ceil
    ranked = dense_ids(verts, key_col="vid", out_col="_rank")
    return ranked.select(
        "vid", ((F.col("_rank") - 1) / block).cast("long").alias("part")
    )


def quality_gate(edges: DataFrame, parts: DataFrame, k: int) -> dict:
    """The genmap --test gate: RSB comm volume must not exceed the block
    distribution's (ref examples/genmap.c:75-78). Returns both volumes."""
    pre = block_partition(edges, k)
    vol_pre = comm_volume(edges, pre)
    vol_post = comm_volume(edges, parts)
    return {"pre": vol_pre, "post": vol_post, "ok": vol_post <= vol_pre}
