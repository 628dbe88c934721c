"""Graph sanity checks (ref /root/reference/src/con-check.c).

- `duplicate_out_links` — analogue of `element_check` (:265-288): every
  element must reference nv DISTINCT vertices → every page's outlink
  list must not contain duplicates (pre-dedup detection).
- `mirror_pairs` — analogue of `face_check` (:197-263): an element pair
  sharing ≥3 vertices is an error → vertex pairs sharing ≥ threshold
  common neighbors are suspicious mirrors. Same wedge-join shape as
  triangle counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parrsb_spark.functions.spmv import symmetrize


def duplicate_out_links(links: DataFrame) -> DataFrame:
    """links = (src_url, dst_url) pre-dedup → rows with count > 1."""
    return (
        links.groupBy("src_url", "dst_url")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def chunked_wedges(
    sym: DataFrame,
    chunk_size: int = 1 << 13,
    max_center_degree: int | None = None,
) -> DataFrame:
    """(c, cd, u, v) — every wedge u–c–v of the symmetrized graph
    exactly once (u < v after normalization downstream; here i<j chunk
    pairs or u<v within-chunk), with the center's degree cd carried
    along (free — the chunk count already needs it; carrying it avoids
    a second join keyed on c, which a 10^8-degree hub would funnel).
    The hub-safe wedge enumerator shared by `mirror_pairs` and link
    prediction (`operators/linkpred.py`).

    Skew design. Every wedge u–c–v must be enumerated exactly once for
    exact common-neighbor counts (a degree-DAG orientation can't drop
    hub-centered wedges the way triangle counting can), so a center of
    degree d inherently contributes C(d,2) wedges — the round-2 plan
    put ALL of a hub's ~d² expansion in the single task owning join key
    c. Fix: block-decomposed self-join salting. Each center's adjacency
    is hash-split into s = ⌈d/chunk_size⌉ chunks; the left stream
    replicates a chunk-a row to tasks (a, j≥a), the right stream a
    chunk-b row to tasks (i≤b, b), and the equi-join on (c, i, j) gives
    every chunk pair (i ≤ j) its own task of ≤ chunk_size² pairs. Each
    unordered pair survives exactly once: cross-chunk pairs only form
    with the lower chunk on the left, within-chunk pairs keep u < v.
    Non-hubs have s=1 — zero replication, the plain self-join. Shuffle
    volume is Σ d·s ≈ Σ d²/chunk_size, the same order as the wedge
    output itself; the win is DISTRIBUTION, not volume.
    """
    cdeg = sym.groupBy(F.col("src").alias("c")).agg(F.count("*").alias("cd"))
    adj = (
        sym.select(F.col("src").alias("c"), F.col("dst").alias("x"))
        .join(cdeg, "c")
        .select(
            "c",
            "cd",
            "x",
            F.ceil(F.col("cd") / F.lit(chunk_size)).cast("int").alias("s"),
        )
        .withColumn("cx", F.pmod(F.xxhash64("x"), F.col("s")).cast("int"))
    )
    if max_center_degree is not None:
        # df-cap: a center above the cap contributes NO wedges. Applied
        # on the adjacency BEFORE the explode/self-join, so a capped
        # hub's Θ(d²) expansion never materializes on either stream.
        adj = adj.filter(F.col("cd") <= max_center_degree)
    left = adj.select(
        "c",
        "cd",
        F.col("x").alias("u"),
        F.col("cx").alias("i"),
        F.explode(F.sequence(F.col("cx"), F.col("s") - 1)).alias("j"),
    )
    right = adj.select(
        "c",
        F.col("x").alias("v"),
        F.explode(F.sequence(F.lit(0), F.col("cx"))).alias("i"),
        F.col("cx").alias("j"),
    )
    return left.join(right, ["c", "i", "j"]).filter(
        (F.col("i") < F.col("j")) | (F.col("u") < F.col("v"))
    ).select("c", "cd", "u", "v")


def mirror_pairs(
    edges: DataFrame, min_shared: int = 3, chunk_size: int = 1 << 13
) -> DataFrame:
    """(u, v, shared) — vertex pairs with ≥ min_shared common neighbors
    (exact; the shape of ref getVToEMap + face_check, ref
    /root/reference/src/con-check.c:197-263). Wedge enumeration and its
    hub-skew analysis: `chunked_wedges`."""
    wedges = chunked_wedges(symmetrize(edges), chunk_size)
    return (
        wedges.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
