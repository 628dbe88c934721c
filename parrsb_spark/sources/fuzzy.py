"""General fuzzy vertex matching — C3 (the con-unique-vertices kernel).

Reference: `findUniqueVertices` fuzzy-matches mesh vertices by iterated
parallel sort + tolerance segmentation: sort by the x coordinate, split
into segments where the gap between consecutive values exceeds the
tolerance, then re-sort each segment by y (then z) and split again;
points left in one final segment share a vertex id
(ref /root/reference/src/con-unique-vertices.c:445-505; the per-segment
tolerance walk is find_segments, :303-319).

The webgraph engine matches on exact canonical URLs (sources/extract),
but the general kernel is part of the reference surface, so here is the
Spark form:

- Dimension 0 is a RANGE-partitioned sort (repartitionByRange), with
  per-partition gap segmentation and a driver-side boundary merge (one
  tiny row per partition — the comm-boundary exchange analogue of the
  reference's talk_to_neighbor at :264-300). No global single-task
  sort at any point.
- Dimensions 1..d-1 window within the current segment: after the first
  split, segments are small and numerous, so partitionBy(seg) windows
  spread across the cluster.
- Segment ids are renumbered densely between dimensions with the
  scalable prefix-scan (functions/ids.py).

Matching is tolerance-CHAINING (transitive within a sorted run), same
as the reference: two points in one segment may differ by more than tol
if connected through intermediate points.

Two tolerance modes, both from the reference:
- ABSOLUTE (scale=None): consecutive points chain while the coordinate
  gap ≤ tol — the fixed-tolerance form.
- ADAPTIVE (C2, scale=(id, dx)): the reference's actual gap test
  (find_segments, :303-310) is RELATIVE to the local mesh scale:
  break when gap² > tol² · min(dx_a, dx_b), where dx = each point's
  SQUARED min distance to its element neighbors
  (find_min_neighbor_distance, ref src/con.c:68-103 — computed here by
  `min_neighbor_distance`). Heterogeneous-density meshes (fine region
  next to coarse region) need this: one global tol either glues the
  fine region or splits the coarse one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parrsb_spark.functions.ids import dense_ids_scalable

_INF = float("inf")


def min_neighbor_distance(
    points: DataFrame,
    elem_col: str,
    coord_cols: list[str],
    id_col: str = "vid",
    topology: DataFrame | None = None,
) -> DataFrame:
    """(id_col, dx) — per point, the SQUARED min distance to neighboring
    points of its element (ref find_min_neighbor_distance,
    src/con.c:68-103).

    Default (topology=None): min over ALL same-element point pairs. The
    reference restricts to NEIGHBOR_MAP (element-topology edges); the
    all-pairs min is equal for non-degenerate elements (diagonals are
    never the min) and needs no topology table — but on DEGENERATE or
    strongly-skewed elements a diagonal CAN be shorter than every edge,
    giving a SMALLER dx than the reference and hence extra segment
    breaks in adaptive fuzzy matching (more-conservative merging, never
    wrong merges). Pass `topology` = (id_col, nbr) point-adjacency pairs
    (directed is fine — symmetrized here) to reproduce the reference's
    NEIGHBOR_MAP semantics exactly on such meshes.

    Self-join fan-out is bounded by the element arity (4 or 8 points) —
    or by the topology degree — so either pass is linear in mesh size."""
    d2 = None
    for c in coord_cols:
        t = (F.col(c) - F.col(f"_o{c}")) ** 2
        d2 = t if d2 is None else d2 + t
    if topology is not None:
        pairs = topology.select(id_col, "nbr")
        pairs = pairs.union(
            pairs.select(F.col("nbr").alias(id_col), F.col(id_col).alias("nbr"))
        )
        a = points.select(id_col, *coord_cols)
        b = points.select(
            F.col(id_col).alias("nbr"), *[F.col(c).alias(f"_o{c}") for c in coord_cols]
        )
        return (
            pairs.join(a, id_col).join(b, "nbr").groupBy(id_col).agg(F.min(d2).alias("dx"))
        )
    cols = [elem_col, id_col, *coord_cols]
    a = points.select(*cols)
    b = points.select(
        elem_col, F.col(id_col).alias("_oid"), *[F.col(c).alias(f"_o{c}") for c in coord_cols]
    )
    return (
        a.join(b, elem_col)
        .filter(F.col(id_col) != F.col("_oid"))
        .groupBy(id_col)
        .agg(F.min(d2).alias("dx"))
    )


def fuzzy_vertex_ids(
    points: DataFrame,
    coord_cols: list[str],
    tol: float,
    id_col: str = "vid",
    out_col: str = "gid",
    scale: DataFrame | None = None,
) -> DataFrame:
    """(id_col, <coords>) → (id_col, out_col): points whose coordinates
    chain within tolerance along every dimension share out_col (= min id
    of the matched set — dense ids can be layered on with dense_ids).

    `scale` = optional (id_col, dx) from `min_neighbor_distance`:
    switches the gap test to the reference's adaptive form
    gap² > tol²·min(dx_a, dx_b) (C2). Points missing from `scale` get
    dx = +inf (always chain — matches the reference, where every mesh
    point has a neighbor distance). NOTE: the default (element-based)
    `min_neighbor_distance` can return a smaller dx than the reference
    on degenerate/skewed elements (diagonal shorter than every edge) —
    extra segment breaks, i.e. conservative under-merging; pass its
    `topology` table to reproduce the reference exactly there."""
    adaptive = scale is not None
    c0 = coord_cols[0]
    t2 = tol * tol

    df = points
    if adaptive:
        df = df.join(
            scale.select(id_col, F.col("dx").alias("_dx")), id_col, "left"
        ).withColumn("_dx", F.coalesce("_dx", F.lit(_INF)))
    else:
        df = df.withColumn("_dx", F.lit(_INF))

    def gap_break(c_col, lag_c, lag_dx) -> F.Column:
        """1 iff consecutive sorted points do NOT chain."""
        if adaptive:
            return (
                (F.col(c_col) - lag_c) ** 2 > t2 * F.least(F.col("_dx"), lag_dx)
            ).cast("int")
        return (F.col(c_col) - lag_c > tol).cast("int")

    df = df.repartitionByRange(F.col(c0), F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("_pid").orderBy(c0, id_col)
    df = df.withColumn("_lag", F.lag(c0).over(w_in)).withColumn(
        "_lagdx", F.lag("_dx").over(w_in)
    )
    # boundary merge: does partition p's first point chain to p-1's last?
    # One tiny row per partition (first/last coord + its dx via min_by /
    # max_by on the (coord, id) order) — the talk_to_neighbor analogue.
    border = {
        int(r["_pid"]): r
        for r in df.groupBy("_pid")
        .agg(
            F.min(c0).alias("lo"),
            F.max(c0).alias("hi"),
            F.min_by("_dx", F.struct(F.col(c0), F.col(id_col))).alias("lodx"),
            F.max_by("_dx", F.struct(F.col(c0), F.col(id_col))).alias("hidx"),
        )
        .collect()
    }
    # chain each partition to the nearest NON-EMPTY predecessor (range
    # partitions can be empty on sparse data)
    merge_pids = []
    prev_hi, prev_hidx = None, None
    for p in sorted(border):
        r = border[p]
        if prev_hi is not None:
            gap = float(r["lo"]) - prev_hi
            if adaptive:
                chains = gap * gap <= t2 * min(float(r["lodx"]), prev_hidx)
            else:
                chains = gap <= tol
            if chains:
                merge_pids.append(p)
        prev_hi, prev_hidx = float(r["hi"]), float(r["hidx"])
    first_brk = F.when(F.col("_pid").isin(merge_pids), 0).otherwise(1) if merge_pids else F.lit(1)
    brk = F.when(F.col("_lag").isNull(), first_brk).otherwise(
        gap_break(c0, F.col("_lag"), F.col("_lagdx"))
    )
    run = Window.partitionBy("_pid").orderBy(c0, id_col).rowsBetween(Window.unboundedPreceding, 0)
    df = df.withColumn("_sub", F.sum(brk).over(run))
    # per-partition break counts → prefix offsets; merged boundaries get
    # the PREVIOUS partition's last segment (offset arithmetic handles it:
    # a merged partition's _sub starts at 0 → lands in prev's last id)
    cnts = {
        int(r["_pid"]): int(r["n"])
        for r in df.groupBy("_pid").agg(F.max("_sub").alias("n")).collect()
    }
    offs, acc = {}, 0
    for p in sorted(border):
        offs[p] = acc
        acc += cnts.get(p, 0)
    from parrsb_spark.operators.fiedler import _lit_map

    df = df.withColumn("_seg", F.col("_sub") + _lit_map(offs)[F.col("_pid")]).drop(
        "_pid", "_lag", "_lagdx", "_sub"
    )

    for c in coord_cols[1:]:
        w = Window.partitionBy("_seg").orderBy(c, id_col)
        lag = F.lag(c).over(w)
        lagdx = F.lag("_dx").over(w)
        brk = F.when(lag.isNull(), 1).otherwise(gap_break(c, lag, lagdx))
        run = w.rowsBetween(Window.unboundedPreceding, 0)
        df = df.withColumn("_sub", F.sum(brk).over(run))
        renum = dense_ids_scalable(
            df.select("_seg", "_sub"), key_col=["_seg", "_sub"], out_col="_seg2"
        )
        df = df.join(renum, ["_seg", "_sub"]).drop("_seg", "_sub").withColumnRenamed(
            "_seg2", "_seg"
        )

    gids = df.groupBy("_seg").agg(F.min(id_col).alias(out_col))
    return df.join(gids, "_seg").select(id_col, out_col)
