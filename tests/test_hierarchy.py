"""B8: node-aware two-level hierarchy (ref src/parrsb.c:186-234,
src/rsb.c:231-262) — level-1 node map, level-2 intra-node parts,
part = node·rpn + local, node-aware cut statistics."""

import pytest
from pyspark.sql import functions as F

from parrsb_spark import graphs
from parrsb_spark.config import EngineOptions
from parrsb_spark.operators.hierarchy import rsb_partition_two_level, two_level_stats
from parrsb_spark.operators.rsb import rsb_partition
from parrsb_spark.operators.stats import edge_cut, partition_sizes


def _opts(**kw):
    base = dict(rsb_max_iter=40, rsb_max_passes=5, rsb_tol=1e-8)
    base.update(kw)
    return EngineOptions(**base)


def test_two_level_single_node_equals_flat(spark):
    """num_nodes=1 degenerates to a flat k=rpn RSB (the reference's
    levels=1 path) — identical part map, node column all zero."""
    edges = graphs.two_cliques_bridge(8)
    df = graphs.to_df(spark, edges)
    two = rsb_partition_two_level(df, 1, 2, opts=_opts())
    flat = rsb_partition(df, 2, opts=_opts())
    got = {r["vid"]: (r["part"], r["node"]) for r in two.collect()}
    exp = {r["vid"]: r["part"] for r in flat.collect()}
    assert {v: p for v, (p, _) in got.items()} == exp
    assert {n for _, (_, n) in got.items()} == {0}


def test_two_level_rpn1_is_node_map(spark):
    """ranks_per_node=1: part == node == the flat num_nodes partition."""
    edges = graphs.two_cliques_bridge(8)
    df = graphs.to_df(spark, edges)
    two = rsb_partition_two_level(df, 2, 1, opts=_opts())
    rows = two.collect()
    assert all(r["part"] == r["node"] for r in rows)
    sizes = sorted(r["n"] for r in partition_sizes(two).collect())
    assert sizes == [8, 8]


def test_two_level_grid_structure(spark):
    """16×8 grid, 2 nodes × 2 ranks: node = part//2 everywhere; the node
    map is a legal 2-way bisection (±1 balance); every node's interior
    split is ±1-balanced; level-2 cuts never cross a node (structural —
    parts of node g are exactly {2g, 2g+1})."""
    edges, _ = graphs.grid2d(16, 8)
    df = graphs.to_df(spark, edges)
    two = rsb_partition_two_level(df, 2, 2, opts=_opts()).localCheckpoint(eager=True)
    rows = two.collect()
    assert len(rows) == 128
    assert all(r["node"] == r["part"] // 2 for r in rows)
    sizes = sorted(r["n"] for r in partition_sizes(two).collect())
    assert sizes == [32, 32, 32, 32]
    # the hierarchical cuts reach the straight-line optimum on the grid:
    # inter-node = one 8-edge column cut; intra-node = two 8-edge cuts
    st = two_level_stats(df, two, ranks_per_node=2)
    assert st["cut_internode"] == 8
    assert st["cut_total"] == st["cut_internode"] + st["cut_intranode"]
    assert st["cut_intranode"] == 16
    assert st["cut_total"] == edge_cut(df, two)


def test_two_level_node_map_matches_standalone(spark):
    """The level-1 node map equals an independent flat num_nodes run —
    the deterministic-init contract makes both solves bit-identical."""
    edges, _ = graphs.grid2d(10, 6)
    df = graphs.to_df(spark, edges)
    two = rsb_partition_two_level(df, 2, 2, opts=_opts())
    flat = rsb_partition(df, 2, opts=_opts())
    got = {r["vid"]: r["node"] for r in two.collect()}
    exp = {r["vid"]: r["part"] for r in flat.collect()}
    assert got == exp


def test_two_level_equals_flat_full_k(spark):
    """two_level(n, r) == flat(n·r) EXACTLY: the hierarchy driver re-groups
    the same deterministic bisection sequence (flat k=n·r's first log2(n)
    cuts are the level-1 solve, its remaining cuts are the seeded level-2
    solve over the same groups), and part = node·rpn + local is the same
    bit layout as flat's append-per-cut numbering. Verified at 64M edges
    on the power-law synthgraph (BENCH_SCALING.jsonl round-5
    two_level_scale: bit-identical part maps, identical inter/intra-node
    cut split); this pins the contract at test scale."""
    edges, _ = graphs.grid2d(16, 8)
    df = graphs.to_df(spark, edges)
    two = rsb_partition_two_level(df, 2, 2, opts=_opts())
    flat = rsb_partition(df, 4, opts=_opts())
    got = {r["vid"]: r["part"] for r in two.collect()}
    exp = {r["vid"]: r["part"] for r in flat.collect()}
    assert got == exp


def test_two_level_stats_volumes(spark):
    """with_volumes: node-level comm volume ≤ rank-level (coarsening the
    part map can only drop distinct-part contacts)."""
    edges, _ = graphs.grid2d(12, 6)
    df = graphs.to_df(spark, edges)
    two = rsb_partition_two_level(df, 2, 2, opts=_opts())
    st = two_level_stats(df, two, 2, with_volumes=True)
    assert st["vol_node"] <= st["vol_rank"]
    assert st["cut_internode"] <= st["cut_total"]


def test_two_level_resume(spark, tmp_path):
    """Interrupting after level 1 and rerunning with the same ckpt_dir
    reproduces the uninterrupted part map (each level resumes from its
    own subdirectory)."""
    edges, _ = graphs.grid2d(8, 8)
    df = graphs.to_df(spark, edges)
    base = rsb_partition_two_level(df, 2, 2, opts=_opts())
    exp = {r["vid"]: r["part"] for r in base.collect()}

    ck = str(tmp_path / "ck")
    # run level 1 only (simulated interruption: level-1 snapshot exists,
    # level-2 not started)
    rsb_partition(df, 2, opts=_opts(), ckpt_dir=f"{ck}/level1").collect()
    # full rerun resumes level 1 from its snapshot and solves level 2
    got_df = rsb_partition_two_level(df, 2, 2, opts=_opts(), ckpt_dir=ck)
    got = {r["vid"]: r["part"] for r in got_df.collect()}
    assert got == exp


def test_two_level_validates_args(spark):
    df = graphs.to_df(spark, graphs.two_cliques_bridge(4))
    with pytest.raises(ValueError):
        rsb_partition_two_level(df, 0, 2)
    with pytest.raises(ValueError):
        rsb_partition_two_level(df, 2, 0)
