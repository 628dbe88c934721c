"""Deterministic random-walk corpus generation — the DeepWalk/node2vec
ingestion stage of an embedding-training pipeline.

At 100 TB the dominant consumer of a webgraph is representation
learning: DeepWalk-style corpora are W walks of length L from every
vertex, fed to a skip-gram trainer (Perozzi et al., KDD'14). The
engine's job is the distributed walk simulation, done — deliberately —
with a DETERMINISTIC pseudo-random step so that every run, and the
DuckDB oracle, replays the walk BIT-IDENTICALLY: seeded reruns and
resume-after-failure produce the same corpus, which is exactly what a
training pipeline needs from its data layer.

The step is inverse-index sampling over a RANK-INDEXED adjacency:
at setup each (src, dst) edge gets rnk = its 1-based position in src's
dst-sorted neighbor list (via the scale-safe `grouped_rank` prefix-scan
— no whole-group window even for a 10^8-degree hub), and a walker at u
moves to the neighbor of rank 1 + h(walk_id, step, u) mod deg(u). The
universal hash ranges over ~2^30 >> deg, so the pick is uniform over
the neighbor set to within deg/2^30 modulo bias, while staying exact
integer math both engines replay.

Why not argmin over a per-neighbor hash (the first design): walkers
concentrate on hubs (the stationary law is ∝ degree), so a src-keyed
candidate join emits E[sum over walkers of deg(cur)] = sum_v deg(v)^2 /
(2m) * W rows per step — measured 139M rows/step on the 16M-edge
power-law bench graph (4.3x the edge table), with the 30533-degree hub
alone funneling ~29M rows through one join task: wall was FLAT from
local[2] to local[8] (448.6s vs 447.9s, BENCH_SCALING.jsonl r5e_ab).
Rank indexing makes each step emit EXACTLY ONE row per walker.

Scale design:
- walk state is ONE row (walk_id, vid) per walker; each step is one
  tiny keyed join against the cached (vid, deg) table (one row per
  vertex — the rnk=1 slice of the index) to fetch the modulus, then
  ONE equi-join against the cached rank-indexed edge table on
  (vid=src, rnk) — the composite key is unique on the edge side, so
  join output = #walkers regardless of degree skew. Only the walker
  state (the small side) shuffles per step.
- the index build is ONE distinct shuffle + ONE range shuffle over
  the edge set: grouped_rank's offsets broadcast carries the group
  total (total_col), so per-vertex degree costs no join.
- per-step frames are localCheckpointed; the emitted corpus is a
  union of L+1 flat frames (lineage stays flat at any L).
- walkers with no out-neighbor (directed dead ends) HOLD in place:
  they have no degs row, so deg and hence rnk are null, the edge
  join misses, and coalesce keeps vid — the fixed-step contract the
  unrolled SQL oracle replays. On the default symmetrized graph
  every vertex has a neighbor, so walks always move.

Reference frame: the walk loop is the reference's frontier sweep
(`comp_nil`, ref /root/reference/src/components.c) with the frontier
replaced by per-walker state and min-label replaced by indexed
sampling; the rank index is the comm_scan numbering (B6) applied to
adjacency lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parrsb_spark.functions.hashing import HASH_SALT_A, HASH_SALT_B, MOD_P, MOD_X
from parrsb_spark.functions.ids import grouped_rank
from parrsb_spark.functions.spmv import symmetrize
from parrsb_spark.sources.edges import vertices_from_edges

# Mixing multipliers for folding (walk_id, step) into the pick hash;
# both < 2^18 so walk_id * MIX_WALK stays far below 2^63 even at
# 10^12 walk ids.
MIX_WALK = 131071
MIX_STEP = 8191


def _pick_hash_sql(walk_expr: str, step: int, vid_expr: str) -> str:
    """Engine-portable SQL for h(walk_id, step, u), the walker's pick
    hash at vertex u: t1(u) * t2(walk, step) + t3(walk, step) mod P,
    from three independent universal hashes. The product term reshuffles
    the pick across vertices per (walk, step); the additive t3 keeps the
    hash varying with (walk, step) even on the ~1/P of vertices where
    t1(u) = 0. Operands stay < 2^30, the product < 2^60 — 63-bit-safe
    in both engines (see functions/hashing.py)."""
    a1, b1 = HASH_SALT_A[0], HASH_SALT_B[0]
    a2, b2 = HASH_SALT_A[1], HASH_SALT_B[1]
    a3, b3 = HASH_SALT_A[2], HASH_SALT_B[2]
    t1 = f"(((({vid_expr}) % {MOD_X}) * {a1} + {b1}) % {MOD_P})"
    ws = f"((({walk_expr}) * {MIX_WALK} + {step * MIX_STEP}) % {MOD_X})"
    t2 = f"((({ws}) * {a2} + {b2}) % {MOD_P})"
    t3 = f"((({ws}) * {a3} + {b3}) % {MOD_P})"
    return f"((({t1} * {t2}) + {t3}) % {MOD_P})"


def indexed_adjacency(edges: DataFrame, directed: bool = False) -> DataFrame:
    """Rank-indexed adjacency: one row per distinct (src, dst) edge with
    rnk = 1-based position of dst in src's dst-sorted neighbor list and
    deg = src's out-degree. (src, rnk) is a unique key — the property
    the one-row-per-walker step join relies on. deg rides grouped_rank's
    offsets broadcast (total_col), so the whole index is ONE distinct
    shuffle + ONE range shuffle over the edge set, no degree join."""
    g = (
        edges.select("src", "dst").distinct()
        if directed
        else symmetrize(edges)
    )
    return grouped_rank(g, "src", ["dst"], out_col="rnk", total_col="deg").select(
        "src", "rnk", "dst", "deg"
    )


def random_walks(
    edges: DataFrame,
    walk_length: int = 8,
    seeds: DataFrame | None = None,
    directed: bool = False,
) -> DataFrame:
    """Returns the walk corpus as (walk_id, step, vid) rows for
    step = 0..walk_length, one walk per seed vertex (walk_id = the
    seed's vid; pass an exploded `seeds` frame with synthetic walk_ids
    for multiple walks per vertex)."""
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = indexed_adjacency(edges, directed=directed).repartition(
        n_shuffle, "src", "rnk"
    ).cache()
    # (vid, deg) — the rnk=1 rows of the cached index, one per vertex
    # with out-neighbors; tiny, cached so steps don't rescan the index
    degs = (
        adj.filter(F.col("rnk") == 1)
        .select(F.col("src").alias("vid"), "deg")
        .cache()
    )
    if seeds is None:
        # all endpoints — includes directed dead ends, which have no
        # degs row and therefore HOLD at step 1
        seeds = vertices_from_edges(adj.select("src", "dst"))
    wid = F.col("walk_id") if "walk_id" in seeds.columns else F.col("vid").alias("walk_id")
    cur = seeds.select(wid, F.lit(0).alias("step"), F.col("vid")).localCheckpoint(eager=True)
    corpus = cur
    for step in range(1, walk_length + 1):
        pick = F.expr(_pick_hash_sql("walk_id", step, "vid"))
        cur = (
            cur.join(degs, "vid", "left")
            .select(
                "walk_id",
                F.col("vid").alias("src"),
                (F.lit(1) + pick % F.col("deg")).alias("rnk"),
            )
            .join(adj.select("src", "rnk", "dst"), ["src", "rnk"], "left")
            .select(
                "walk_id",
                F.lit(step).alias("step"),
                F.coalesce(F.col("dst"), F.col("src")).alias("vid"),
            )
            .localCheckpoint(eager=True)
        )
        corpus = corpus.unionByName(cur)
    adj.unpersist()
    degs.unpersist()
    return corpus
