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


def test_check_tagged_partitions_identical_layers_pass(spark):
    """Two identical 3×3 grid layers → per-rank degree footprints equal →
    invariant holds (empty result). Ref parrsb_check_tagged_partitions."""
    edges = graphs.two_components(3, 3)
    df = graphs.to_df(spark, edges)
    tags = spark.createDataFrame(
        [(v, "a" if v <= 9 else "b") for v in range(1, 19)], ["vid", "tag"]
    )
    assert check_tagged_partitions(df, tags).count() == 0


def test_check_tagged_partitions_fires_on_violation(spark):
    """NEGATIVE: layer a = 3×3 grid (corner deg 2, center deg 4), layer b =
    9-ring (all deg 2) — same sizes, different footprints → must fire."""
    grid, _ = graphs.grid2d(3, 3)  # vids 1..9
    ring = [(u + 9, v + 9) for u, v in graphs.ring(9)]  # vids 10..18
    df = graphs.to_df(spark, grid + ring)
    tags = spark.createDataFrame(
        [(v, "a" if v <= 9 else "b") for v in range(1, 19)], ["vid", "tag"]
    )
    bad = check_tagged_partitions(df, tags).collect()
    assert len(bad) > 0
    assert any(r["min_deg"] != r["max_deg"] for r in bad)


def test_check_tagged_partitions_fires_on_size_mismatch(spark):
    """NEGATIVE: layers of different vertex counts → trailing ranks exist in
    one layer only → n_layers < ntags fires."""
    grid, _ = graphs.grid2d(3, 3)
    df = graphs.to_df(spark, grid)
    tags = spark.createDataFrame(
        [(v, "a") for v in range(1, 10)] + [(100, "b"), (101, "b")], ["vid", "tag"]
    )
    bad = check_tagged_partitions(df, tags).collect()
    assert any(r["n_layers"] == 1 for r in bad)


def test_rsb_partition_tagged_constant_stages_per_tagcount(spark):
    """The grouped driver must NOT loop tags on the driver: the Spark job
    count for 4 identical tag layers stays within ~1.25× of 2 layers
    (grouped Lanczos — stage count independent of group count)."""
    sc = spark.sparkContext

    def run(n_layers, group):
        grid, _ = graphs.grid2d(3, 3)
        all_edges = []
        rows = []
        for i in range(n_layers):
            all_edges += [(u + 9 * i, v + 9 * i) for u, v in grid]
            rows += [(v + 9 * i, f"t{i}") for v in range(1, 10)]
        df = graphs.to_df(spark, all_edges)
        tags = spark.createDataFrame(rows, ["vid", "tag"])
        sc.setJobGroup(group, group)
        try:
            out = rsb_partition_tagged(df, tags, parts_per_tag=2, opts=_opts())
            got = {r["vid"]: r["part"] for r in out.collect()}
        finally:
            sc.setJobGroup(None, None)
        # contract: tag i ends up in parts {2i, 2i+1}, balanced 4/5 split
        for i in range(n_layers):
            ps = [got[v + 9 * i] for v in range(1, 10)]
            assert set(ps) == {2 * i, 2 * i + 1}
            assert sorted((ps.count(2 * i), ps.count(2 * i + 1))) == [4, 5]
        return len(sc.statusTracker().getJobIdsForGroup(group))

    jobs2 = run(2, "tagged-probe-2")
    jobs4 = run(4, "tagged-probe-4")
    assert jobs4 <= jobs2 * 1.25 + 2, (jobs2, jobs4)


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
