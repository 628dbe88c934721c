"""E8/E9/E10: tagged partitioning + greedy solid assignment."""

from pyspark.sql import functions as F

from parrsb_spark import graphs
from parrsb_spark.config import EngineOptions
from parrsb_spark.operators.stats import partition_sizes
from parrsb_spark.operators.tagged import (
    assign_solid_to_parts,
    check_tagged_partitions,
    rsb_partition_tagged,
)


def _opts():
    return EngineOptions(rsb_max_iter=25, rsb_max_passes=2, rsb_tol=1e-6)


def test_rsb_partition_tagged(spark):
    """Two disjoint grids, one tag each → 2 parts per tag → 4 global parts,
    each tag partitioned independently (ref parrsb_part_mesh_v1)."""
    edges = graphs.two_components(4, 4)
    df = graphs.to_df(spark, edges)
    tags = spark.createDataFrame(
        [(v, "a" if v <= 16 else "b") for v in range(1, 33)], ["vid", "tag"]
    )
    parts = rsb_partition_tagged(df, tags, parts_per_tag=2, opts=_opts())
    rows = {r["vid"]: r["part"] for r in parts.collect()}
    assert set(rows.values()) == {0, 1, 2, 3}
    # tag a (vids 1-16) only in parts 0/1; tag b in 2/3
    assert all(rows[v] in (0, 1) for v in range(1, 17))
    assert all(rows[v] in (2, 3) for v in range(17, 33))
    sizes = sorted(r["n"] for r in partition_sizes(parts).collect())
    assert sizes == [8, 8, 8, 8]


def test_check_tagged_partitions_symmetric(spark):
    edges = graphs.two_components(3, 3)
    df = graphs.to_df(spark, edges)
    tags = spark.createDataFrame(
        [(v, "a" if v <= 9 else "b") for v in range(1, 19)], ["vid", "tag"]
    )
    # disjoint tags → no cross-tag edges → invariant holds trivially
    assert check_tagged_partitions(df, tags).count() == 0


def test_assign_solid_majority(spark):
    """Grid split left/right; the middle column (unassigned) must attach to
    its majority-adjacent side (ref parrsb_part_solid BFS majority vote)."""
    edges, _ = graphs.grid2d(5, 4)  # vids 1..20, x = (vid-1) % 5
    df = graphs.to_df(spark, edges)
    fluid = spark.createDataFrame(
        [(v, 0 if (v - 1) % 5 <= 1 else 1) for v in range(1, 21) if (v - 1) % 5 != 2],
        ["vid", "part"],
    )
    solid = spark.createDataFrame([(v,) for v in range(1, 21) if (v - 1) % 5 == 2], ["vid"])
    out = {r["vid"]: r["part"] for r in assign_solid_to_parts(df, fluid, solid).collect()}
    assert len(out) == 20
    for v in range(1, 21):
        if (v - 1) % 5 == 2:
            assert out[v] in (0, 1)  # attached somewhere adjacent
    # all solids assigned, fluid assignments unchanged
    for r in fluid.collect():
        assert out[r["vid"]] == r["part"]
