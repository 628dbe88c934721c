"""Triangle counting — degree-oriented wedge join.

Same relational shape as the reference's `face_check` (shared-vertex
pair counting, ref /root/reference/src/con-check.c:26-263): self-join
the adjacency on a shared endpoint, then close the wedge.

Skew design (the part that matters at 100 TB): edges are oriented from
the lower-(degree, vid) endpoint to the higher one, so every vertex's
out-neighborhood in the oriented DAG is O(sqrt(m)) even for power-law
hubs — the classic compact-forward bound. The wedge self-join therefore
never explodes on a hub the way a naive u<v ordering would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parrsb_spark.functions.spmv import degrees, symmetrize
from parrsb_spark.sources.edges import vertices_from_edges


def _oriented(edges: DataFrame) -> DataFrame:
    """Edges oriented by the total order (deg, vid), compared as TWO
    primitive long columns. Overflow-free: a packed `deg*2^32 + vid`
    long lets vid bits bleed into deg bits at vid ≥ 2³², silently
    corrupting the orientation order on a 10¹²-vertex graph. Primitive
    columns rather than a struct key: struct comparisons drop out of
    whole-stage codegen's primitive fast path (measured ~2× on the
    copurchase bench graph).

    Shuffle shape (guide §2.3): round 5 built the symmetrized 2|E| edge
    set TWICE (once here, once inside `degrees`) — two distinct
    exchanges over 2|E| rows — then dropped half the rows with the
    orientation filter. Here the graph is canonicalized ONCE to |E|
    (least, greatest) rows (one half-width distinct; Catalyst reuses
    the exchange for the degree subtree), degrees come from a map-side-
    combined union aggregate over those rows, and the orientation is a
    branch-free swap instead of a 50% filter over 2|E|."""
    canon = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # ONE pass over canon (explode of a 2-array), not a 2-branch union —
    # each union branch replans the whole canon subtree (scan + self-join
    # + distinct) and runtime exchange reuse is best-effort
    deg = (
        canon.select(F.explode(F.array("a", "b")).alias("vid"))
        .groupBy("vid")
        .agg(F.count("*").alias("deg"))
    )
    e = canon.join(
        deg.select(F.col("vid").alias("a"), F.col("deg").alias("da")), "a"
    ).join(deg.select(F.col("vid").alias("b"), F.col("deg").alias("db")), "b")
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("d_dst"),
    )


def triangle_list(edges: DataFrame) -> DataFrame:
    """(u, v, w) — each triangle exactly once, u→v→w in orientation order."""
    o = _oriented(edges).cache()
    e1 = o.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("d_dst").alias("dv"))
    e2 = o.select(F.col("src").alias("u"), F.col("dst").alias("w"), F.col("d_dst").alias("dw"))
    lt = (F.col("dv") < F.col("dw")) | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    wedges = e1.join(e2, "u").filter(lt).select("u", "v", "w")
    closing = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    return wedges.join(closing, ["v", "w"]).select("u", "v", "w")


def triangle_total(edges: DataFrame) -> int:
    return triangle_list(edges).count()


def triangle_counts(edges: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """(vid, tri) — per-vertex triangle participation counts (exact)."""
    tri = triangle_list(edges)
    exploded = (
        tri.select(F.col("u").alias("vid"))
        .union(tri.select(F.col("v").alias("vid")))
        .union(tri.select(F.col("w").alias("vid")))
    )
    counts = exploded.groupBy("vid").agg(F.count("*").alias("tri"))
    verts = (vertices or vertices_from_edges(edges)).select("vid")
    return verts.join(counts, "vid", "left").select(
        "vid", F.coalesce("tri", F.lit(0)).alias("tri")
    )


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """(vid, tri, deg, lcc) — local clustering coefficient per vertex:
    lcc = tri / C(deg, 2) over the symmetrized simple graph, 0.0 where
    deg < 2. The spam-farm / template-cluster detector a webgraph
    pipeline runs right after triangle counting: link farms sit at
    lcc ≈ 1, genuine hubs near 0.

    Pure composition — one triangle pass + one degree aggregate joined
    on vid; no new shuffle shapes beyond the compact-forward join above,
    and the single division is IEEE-exact (one double op), so results
    are bitwise reproducible across partitionings.
    """
    tri = triangle_counts(edges)
    deg = degrees(edges)
    d = F.coalesce("deg", F.lit(0))
    return tri.join(deg, "vid", "left").select(
        "vid",
        "tri",
        d.alias("deg"),
        F.when(
            d >= 2, 2.0 * F.col("tri") / (d.cast("double") * (d - F.lit(1)).cast("double"))
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )
