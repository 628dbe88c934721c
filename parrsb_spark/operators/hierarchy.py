"""Node-aware two-level partitioning (SURVEY §2 B8).

The reference partitions in TWO levels when `options->levels == 2`
(ref /root/reference/src/parrsb.c:186-234 `initialize_levels`: level-1
communicator = global, level-2 = the shared-memory node split): level 1
runs ⌈log₂ num_nodes⌉ bisections whose binning is at NODE granularity
(`get_bin` / `get_level_cuts`, ref src/rsb.c:231-262 — the bin index is
the node-leader rank, so a split boundary never straddles a node), and
level 2 recurses inside each node's communicator for the remaining
⌈log₂ ranks_per_node⌉ cuts. The payoff on a real machine: the
expensive cuts (inter-node network) are few and come first; the many
cheap cuts stay inside a node's shared memory.

Spark-first redesign: level 1 is a plain `rsb_partition` to
`num_nodes` parts; level 2 is ONE seeded `rsb_partition` whose
`seed_parts` are the level-1 node map — every node's interior
partitioning rides the same grouped-Lanczos loop CONCURRENTLY, so the
level-2 stage count is constant in the number of nodes (the reference
instead relies on comm_split giving each node an independent
communicator). The final part id is `node · ranks_per_node + local`
(the reference's rank numbering within the node communicator), so
consecutive part ids share a node — exactly the layout a node-aware
scheduler wants, and the layout under which `two_level_stats`'s
inter-node cut is `part // ranks_per_node`-computable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parrsb_spark.config import EngineOptions
from parrsb_spark.functions.spmv import symmetrize
from parrsb_spark.operators.rsb import rsb_partition
from parrsb_spark.operators.stats import _tag, comm_volume


def rsb_partition_two_level(
    edges: DataFrame,
    num_nodes: int,
    ranks_per_node: int,
    opts: EngineOptions | None = None,
    vertices: DataFrame | None = None,
    coords: DataFrame | None = None,
    lineage=None,
    ckpt_dir: str | None = None,
    check_components: bool = False,
) -> DataFrame:
    """Returns (vid, part, node) with part ∈ [0, num_nodes·ranks_per_node)
    and node = part // ranks_per_node.

    Contract (mirrors the reference's two-level invariants):
    - the node map IS an RSB `num_nodes`-way partition of the full graph
      (level-1 cuts bin at node granularity, ref src/rsb.c:231-242);
    - within each node, the local parts are an RSB `ranks_per_node`-way
      partition of the node's induced subgraph (level-2 cuts never cross
      a node boundary — the reference's node communicator, here the
      seed-group isolation of the grouped driver);
    - balance: every bisection at both levels is the rank-exact
      ⌈·⌉/⌊·⌋ split, so part sizes differ by at most 1 per bisection
      chain (same contract as `rsb_partition`).

    `ckpt_dir` checkpoints each level under its own subdirectory
    (`<ckpt_dir>/level1`, `<ckpt_dir>/level2`), so an interrupted run
    resumes inside whichever level it died in (level 1 re-reads its own
    finished snapshot rather than re-solving).
    """
    if num_nodes < 1 or ranks_per_node < 1:
        raise ValueError("num_nodes and ranks_per_node must be >= 1")
    kw = dict(
        opts=opts,
        coords=coords,
        lineage=lineage,
        check_components=check_components,
    )
    # per-level lineage tags: the reference reports stats PER LEVEL over
    # each level's communicator (ref src/helpers.c:132-224); tagging the
    # rows rsb_l1/rsb_l2 gives `format_phase_report` the same split
    node_map = rsb_partition(
        edges,
        num_nodes,
        vertices=vertices,
        ckpt_dir=f"{ckpt_dir}/level1" if ckpt_dir else None,
        lineage_tag="rsb_l1",
        **kw,
    )
    if ranks_per_node == 1:
        return node_map.select("vid", "part", F.col("part").alias("node"))
    # reused as the level-2 seed AND (implicitly) as part // rpn below;
    # cut the level-1 lineage so the second solve doesn't recompute it
    node_map = node_map.localCheckpoint(eager=True)
    final = rsb_partition(
        edges,
        ranks_per_node,
        seed_parts=node_map,
        ckpt_dir=f"{ckpt_dir}/level2" if ckpt_dir else None,
        lineage_tag="rsb_l2",
        **kw,
    )
    # seed groups are the dense node ids 0..num_nodes-1, and the seeded
    # driver numbers leaves seed_rank·k + local (order-preserving tree
    # ids) — so the node is recoverable as an integer division, no join.
    return final.select(
        "vid", "part", (F.col("part") / ranks_per_node).cast("long").alias("node")
    )


def two_level_stats(
    edges: DataFrame,
    parts: DataFrame,
    ranks_per_node: int,
    with_volumes: bool = False,
) -> dict:
    """Node-aware partition quality: split the edge cut into INTER-node
    (crosses a node boundary — real-network traffic on the reference's
    machine model) and INTRA-node (crosses ranks inside one node —
    shared-memory traffic). The reference reports the analogous
    min/avg/max per-level message volumes via `parrsb_get_part_stat`
    over each level's communicator (ref src/helpers.c:132-224).

    One symmetrize + one two-sided tag pass computes both cuts (no
    second scan for the node level). `with_volumes=True` additionally
    reports the comm-volume metric at rank and node granularity (two
    more passes — the gate metric, priced separately because cut-only
    callers shouldn't pay it).
    """
    node_of = (F.col("part") / ranks_per_node).cast("long")
    und = symmetrize(edges).filter(F.col("src") < F.col("dst"))
    row = (
        _tag(und, parts)
        .agg(
            F.sum((F.col("p1") != F.col("p2")).cast("long")).alias("cut"),
            F.sum(
                (
                    (F.col("p1") / ranks_per_node).cast("long")
                    != (F.col("p2") / ranks_per_node).cast("long")
                ).cast("long")
            ).alias("cut_node"),
        )
        .collect()[0]
    )
    out = {
        "cut_total": int(row["cut"] or 0),
        "cut_internode": int(row["cut_node"] or 0),
        "cut_intranode": int(row["cut"] or 0) - int(row["cut_node"] or 0),
    }
    if with_volumes:
        out["vol_rank"] = comm_volume(edges, parts)
        out["vol_node"] = comm_volume(edges, parts.select("vid", node_of.alias("part")))
    return out
