"""Deterministic random-walk corpus generation — the DeepWalk/node2vec
ingestion stage of an embedding-training pipeline.

At 100 TB the dominant consumer of a webgraph is representation
learning: DeepWalk-style corpora are W walks of length L from every
vertex, fed to a skip-gram trainer (Perozzi et al., KDD'14). The
engine's job is the distributed walk simulation; this kernel does it
with the same frontier discipline as BFS/SSSP and — deliberately —
with a DETERMINISTIC pseudo-random step: walker w at vertex u moves to
the out-neighbor v minimizing a portable universal hash
h(walk_id, step, v). The hash ranks neighbors uniformly (each neighbor
is the argmin with equal probability over walk ids), so corpus
statistics match uniform random walks, while every run — and the
DuckDB oracle — replays the walk BIT-IDENTICALLY. Seeded reruns and
resume-after-failure produce the same corpus, which is exactly what a
training pipeline needs from its data layer.

Scale design:
- walk state is ONE row (walk_id, vid) per walker; each step is ONE
  src-keyed equi-join against the cached edge table + ONE
  groupBy(walk_id).agg(min(struct(h, dst))) — min over a struct is
  associative and map-side combinable, so a 10^8-degree hub
  contributes one candidate row per map task, the same hub-safe
  reduce shape as PageRank's salted sum and ANF's bit_or.
- per-step frames are localCheckpointed; the emitted corpus is a
  union of L+1 flat frames (lineage stays flat at any L).
- walkers with no out-neighbor (directed dead ends) HOLD in place via
  the left join's coalesce — the fixed-step contract the unrolled SQL
  oracle replays; on the default symmetrized graph every vertex has a
  neighbor, so walks always move.

Reference frame: the walk loop is the reference's frontier sweep
(`comp_nil`, ref /root/reference/src/components.c) with the frontier
replaced by per-walker state and min-label replaced by min-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parrsb_spark.functions.hashing import HASH_SALT_A, HASH_SALT_B, MOD_P, MOD_X
from parrsb_spark.functions.spmv import symmetrize
from parrsb_spark.sources.edges import vertices_from_edges

# Mixing multipliers for folding (walk_id, step) into the per-neighbor
# hash; both < 2^18 so walk_id * MIX_WALK stays far below 2^63 even at
# 10^12 walk ids.
MIX_WALK = 131071
MIX_STEP = 8191


def _step_hash_sql(walk_expr: str, step: int, dst_expr: str) -> str:
    """Engine-portable SQL for h(walk_id, step, dst): the PRODUCT mod P
    of independent universal hashes of dst and of (walk_id, step). The
    product form matters: an additive mix is linear in walk_id, so all
    neighbors of a vertex shift by the SAME stride mod P and the argmin
    winner changes only at wraparounds — measured on a 12-leaf star,
    three leaves won 80% of 200 walks. Multiplying by a per-(walk,step)
    residue reshuffles the neighbor order every step (each neighbor is
    argmin w.p. ~1/deg). Operands stay < 2^30, product < 2^60 —
    63-bit-safe in both engines (see functions/hashing.py)."""
    a1, b1 = HASH_SALT_A[0], HASH_SALT_B[0]
    a2, b2 = HASH_SALT_A[1], HASH_SALT_B[1]
    t1 = f"(((({dst_expr}) % {MOD_X}) * {a1} + {b1}) % {MOD_P})"
    ws = f"((({walk_expr}) * {MIX_WALK} + {step * MIX_STEP}) % {MOD_X})"
    t2 = f"((({ws}) * {a2} + {b2}) % {MOD_P})"
    return f"(({t1} * {t2}) % {MOD_P})"


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
    g = (edges if directed else symmetrize(edges)).repartition(n_shuffle, "src").cache()
    if seeds is None:
        seeds = vertices_from_edges(g)
    wid = F.col("walk_id") if "walk_id" in seeds.columns else F.col("vid").alias("walk_id")
    cur = seeds.select(wid, F.lit(0).alias("step"), F.col("vid")).localCheckpoint(eager=True)
    corpus = cur
    for step in range(1, walk_length + 1):
        cand = g.join(
            cur.select("walk_id", F.col("vid").alias("src")), "src"
        ).select(
            "walk_id",
            "dst",
            F.expr(_step_hash_sql("walk_id", step, "dst")).alias("h"),
        )
        nxt = (
            cand.groupBy("walk_id")
            .agg(F.min(F.struct("h", "dst")).alias("pick"))
            .select("walk_id", F.col("pick.dst").alias("vid"))
        )
        cur = (
            cur.select("walk_id", F.col("vid").alias("prev"))
            .join(nxt, "walk_id", "left")
            .select(
                "walk_id",
                F.lit(step).alias("step"),
                F.coalesce(F.col("vid"), F.col("prev")).alias("vid"),
            )
            .localCheckpoint(eager=True)
        )
        corpus = corpus.unionByName(cur)
    g.unpersist()
    return corpus
