"""General fuzzy vertex matching — C3 (the con-unique-vertices kernel).

Reference: `findUniqueVertices` fuzzy-matches mesh vertices by iterated
parallel sort + tolerance segmentation: sort by the x coordinate, split
into segments where the gap between consecutive values exceeds the
tolerance, then re-sort each segment by y (then z) and split again;
points left in one final segment share a vertex id
(ref /root/reference/src/con-unique-vertices.c:445-505; the per-segment
tolerance walk is :200-283).

The webgraph engine matches on exact canonical URLs (sources/extract),
but the general kernel is part of the reference surface, so here is the
Spark form:

- Dimension 0 is a RANGE-partitioned sort (repartitionByRange), with
  per-partition gap segmentation and a driver-side boundary merge (one
  tiny row per partition — the comm-boundary exchange analogue of the
  reference's parallel transfer at :471-489). No global single-task
  sort at any point.
- Dimensions 1..d-1 window within the current segment: after the first
  split, segments are small and numerous, so partitionBy(seg) windows
  spread across the cluster.
- Segment ids are renumbered densely between dimensions with the
  scalable prefix-scan (functions/ids.py).

Matching is tolerance-CHAINING (transitive within a sorted run), same
as the reference: two points in one segment may differ by more than tol
if connected through intermediate points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parrsb_spark.functions.ids import dense_ids_scalable


def fuzzy_vertex_ids(
    points: DataFrame,
    coord_cols: list[str],
    tol: float,
    id_col: str = "vid",
    out_col: str = "gid",
) -> DataFrame:
    """(id_col, <coords>) → (id_col, out_col): points whose coordinates
    chain within `tol` along every dimension share out_col (= min id of
    the matched set — dense ids can be layered on with dense_ids)."""
    c0 = coord_cols[0]
    df = points.repartitionByRange(F.col(c0), F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("_pid").orderBy(c0, id_col)
    df = df.withColumn("_lag", F.lag(c0).over(w_in))
    # boundary merge: does partition p's first value chain to p-1's last?
    bounds = {
        int(r["_pid"]): (float(r["lo"]), float(r["hi"]))
        for r in df.groupBy("_pid").agg(F.min(c0).alias("lo"), F.max(c0).alias("hi")).collect()
    }
    # chain each partition to the nearest NON-EMPTY predecessor (range
    # partitions can be empty on sparse data)
    merge_pids = []
    prev_hi = None
    for p in sorted(bounds):
        if prev_hi is not None and bounds[p][0] - prev_hi <= tol:
            merge_pids.append(p)
        prev_hi = bounds[p][1]
    first_brk = F.when(F.col("_pid").isin(merge_pids), 0).otherwise(1) if merge_pids else F.lit(1)
    brk = F.when(F.col("_lag").isNull(), first_brk).otherwise(
        (F.col(c0) - F.col("_lag") > tol).cast("int")
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
    for p in sorted(bounds):
        offs[p] = acc
        acc += cnts.get(p, 0)
    from parrsb_spark.operators.fiedler import _lit_map

    df = df.withColumn("_seg", F.col("_sub") + _lit_map(offs)[F.col("_pid")]).drop(
        "_pid", "_lag", "_sub"
    )

    for c in coord_cols[1:]:
        w = Window.partitionBy("_seg").orderBy(c, id_col)
        lag = F.lag(c).over(w)
        brk = F.when(lag.isNull(), 1).otherwise((F.col(c) - lag > tol).cast("int"))
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
