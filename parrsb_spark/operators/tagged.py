"""Tagged (grouped) partitioning + greedy co-partitioning.

E8 — `parrsb_part_mesh_v1` (ref /root/reference/src/parrsb.c:379-561):
distinct tags are densely renumbered and RSB runs INDEPENDENTLY per tag
group, local part ids mapped to a global id space. The Spark form falls
out of the grouped Lanczos design for free: seed the group column with
the dense tag id instead of 0 — every tag partitions concurrently in
the same DataFrame loop (the reference routes each tag to a process
block; we never need to).

E10 — `parrsb_part_solid` (ref /root/reference/src/parrsb.c:617-851):
greedily attach unassigned ("solid") vertices to an existing partition
map by BFS majority vote with per-partition quotas: rounds of
gather-majority (mode with deterministic tie-break), hop-ordered
greedy acceptance capped at quota — the label-propagation skeleton.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parrsb_spark.config import EngineOptions, default_options
from parrsb_spark.functions.spmv import symmetrize


def rsb_partition_tagged(
    edges: DataFrame,
    tags: DataFrame,
    parts_per_tag: int,
    opts: EngineOptions | None = None,
) -> DataFrame:
    """tags = (vid, tag). Returns (vid, part) with part globally unique:
    part = dense_tag_index * parts_per_tag + local_part (the reference's
    local→global mapping, ref src/parrsb.c:528-541)."""
    from parrsb_spark.operators.rsb import rsb_partition

    spark = edges.sparkSession
    dense = tags.select("tag").distinct().orderBy("tag").collect()
    tag_idx = {r["tag"]: i for i, r in enumerate(dense)}
    mapping = F.broadcast(
        spark.createDataFrame([(t, i) for t, i in tag_idx.items()], ["tag", "tidx"])
    )
    tagged = tags.join(mapping, "tag").select("vid", "tidx")
    # intra-tag edges only (the reference asserts tags partition the mesh)
    t_src = tagged.select(F.col("vid").alias("src"), F.col("tidx").alias("t1"))
    t_dst = tagged.select(F.col("vid").alias("dst"), F.col("tidx").alias("t2"))
    intra = (
        edges.join(t_src, "src").join(t_dst, "dst").filter(F.col("t1") == F.col("t2")).select("src", "dst")
    )
    out = None
    for t, i in sorted(tag_idx.items(), key=lambda kv: kv[1]):
        verts = tagged.filter(F.col("tidx") == i).select("vid")
        sub = intra.join(verts.withColumnRenamed("vid", "src"), "src", "left_semi")
        parts = rsb_partition(sub, parts_per_tag, opts=opts, vertices=verts)
        piece = parts.select("vid", (F.col("part") + i * parts_per_tag).alias("part"))
        out = piece if out is None else out.union(piece)
    return out


def check_tagged_partitions(edges: DataFrame, tags: DataFrame) -> DataFrame:
    """E9 invariant (ref parrsb_check_tagged_partitions, src/parrsb.c:292-377):
    returns tag pairs whose cross-tag edge counts are asymmetric — empty
    DataFrame = invariant holds (layers have identical connectivity
    footprints)."""
    t = tags.select("vid", "tag")
    sym = symmetrize(edges)
    x = (
        sym.join(t.withColumnRenamed("vid", "src").withColumnRenamed("tag", "tag1"), "src")
        .join(t.withColumnRenamed("vid", "dst").withColumnRenamed("tag", "tag2"), "dst")
        .filter(F.col("tag1") != F.col("tag2"))
        .groupBy("tag1", "tag2")
        .agg(F.count("*").alias("n12"))
    )
    y = x.select(F.col("tag2").alias("tag1"), F.col("tag1").alias("tag2"), F.col("n12").alias("n21"))
    return (
        x.join(y, ["tag1", "tag2"], "full")
        .filter(F.coalesce("n12", F.lit(0)) != F.coalesce("n21", F.lit(0)))
    )


def assign_solid_to_parts(
    edges: DataFrame,
    fluid_parts: DataFrame,
    solid: DataFrame,
    max_rounds: int = 50,
) -> DataFrame:
    """Greedy quota-capped BFS attachment (ref parrsb_part_solid).

    fluid_parts = (vid, part) already partitioned; solid = (vid) to attach.
    Per round: unassigned solids adjacent to assigned vertices vote for the
    majority neighbor partition (ties → smallest part id — deterministic
    analogue of the reference's vote count, src/parrsb.c:592-607); rounds
    repeat until all reachable solids are assigned (quota = ⌈n_solid/np⌉
    per round batch, hop-ordered, ref :815-825)."""
    spark = edges.sparkSession
    sym = symmetrize(edges).cache()
    n_parts = fluid_parts.select("part").distinct().count()
    n_solid = solid.count()
    quota = math.ceil(n_solid / max(n_parts, 1)) if n_solid else 0
    assigned = fluid_parts.select("vid", "part").localCheckpoint(eager=True)
    remaining = solid.select("vid").join(assigned, "vid", "left_anti").localCheckpoint(eager=True)
    taken = {r["part"]: 0 for r in fluid_parts.select("part").distinct().collect()}

    for _ in range(max_rounds):
        if remaining.isEmpty():
            break
        votes = (
            sym.join(assigned.withColumnRenamed("vid", "src"), "src")
            .select(F.col("dst").alias("vid"), "part")
            .join(remaining, "vid", "left_semi")
            .groupBy("vid", "part")
            .agg(F.count("*").alias("cnt"))
        )
        w = Window.partitionBy("vid").orderBy(F.desc("cnt"), F.asc("part"))
        pick = votes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
        # quota: accept up to (quota - taken) per part, best-connected first
        wq = Window.partitionBy("part").orderBy(F.desc("cnt"), F.asc("vid"))
        cap_rows = [(p, max(quota - taken.get(p, 0), 0)) for p in taken]
        caps = F.broadcast(spark.createDataFrame(cap_rows, ["part", "cap"]))
        accepted = (
            pick.withColumn("qrn", F.row_number().over(wq))
            .join(caps, "part")
            .filter(F.col("qrn") <= F.col("cap"))
            .select("vid", "part")
            .localCheckpoint(eager=True)
        )
        n_acc = accepted.count()
        if n_acc == 0:
            # frontier exists but all quotas full → relax (reference loops
            # with refreshed quotas until everything lands, :747)
            if pick.isEmpty():
                break
            for p in taken:
                taken[p] = 0
            continue
        for r in accepted.groupBy("part").count().collect():
            taken[r["part"]] = taken.get(r["part"], 0) + r["count"]
        assigned = assigned.union(accepted).localCheckpoint(eager=True)
        remaining = remaining.join(accepted, "vid", "left_anti").localCheckpoint(eager=True)
    sym.unpersist()
    return assigned
