"""Community quality metrics — Newman modularity over a label map.

Completes the label-propagation pipeline the way the reference's
partition pipeline is completed by its quality gate (`parrsb_check`'s
component/imbalance audit, ref /root/reference/src/parrsb.c and the
genmap --test comm-volume gate): a partitioner without a quality
metric is unfalsifiable. For link-graph communities the standard
metric is modularity Q = Σ_c [ L_c/m − (deg_c/(2m))² ] (Newman 2006),
where L_c is the number of intra-community edges, deg_c the total
degree of community c, and m the undirected edge count.

Scale design:
- ONE broadcast-keyed label attach per endpoint (two src/dst-keyed
  equi-joins against the label map — shuffle-partitioned, hub-safe),
  then a groupBy(label) whose partial aggregates combine map-side;
  per-community state is three longs.
- m enters the plan as a broadcast 1-row aggregate (the dangling-mass
  pattern from pagerank.py) — no driver collect, one plan.
- the per-community contribution is a single float expression over
  exact integer aggregates, written identically in the SQL oracle, so
  Spark and DuckDB agree BITWISE (IEEE ops on identical operands in an
  identical tree) — no tolerance in the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parrsb_spark.functions.spmv import degrees, symmetrize


def modularity_by_community(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community modularity decomposition.

    `edges`: undirected unique edges (src < dst, no duplicates).
    `labels`: (vid, label) covering every endpoint.

    Returns (label, members, edges_in, deg_sum, contrib) where
    Q = Σ contrib. All aggregate columns are exact integers; contrib
    is the one float expression documented above.
    """
    lab_src = labels.select(F.col("vid").alias("src"), F.col("label").alias("lsrc"))
    lab_dst = labels.select(F.col("vid").alias("dst"), F.col("label").alias("ldst"))
    tagged = edges.join(lab_src, "src").join(lab_dst, "dst")
    edges_in = (
        tagged.filter(F.col("lsrc") == F.col("ldst"))
        .groupBy(F.col("lsrc").alias("label"))
        .agg(F.count("*").alias("edges_in"))
    )
    deg_sum = (
        degrees(edges)
        .join(labels, "vid")
        .groupBy("label")
        .agg(F.count("*").alias("members"), F.sum("deg").alias("deg_sum"))
    )
    total = edges.agg(F.count("*").alias("m"))
    per = (
        deg_sum.join(edges_in, "label", "left")
        .withColumn("edges_in", F.coalesce(F.col("edges_in"), F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(total))
    )
    half = F.col("deg_sum").cast("double") / (F.lit(2.0) * F.col("m").cast("double"))
    contrib = F.col("edges_in").cast("double") / F.col("m").cast("double") - half * half
    return per.select(
        "label",
        F.col("members").cast("long").alias("members"),
        "edges_in",
        F.col("deg_sum").cast("long").alias("deg_sum"),
        contrib.alias("contrib"),
    )


def modularity(edges: DataFrame, labels: DataFrame) -> float:
    """Scalar Q — driver-side sum of the per-community decomposition
    (bounded: one row per community)."""
    rows = modularity_by_community(edges, labels).select("contrib").collect()
    return float(sum(r["contrib"] for r in rows))


def louvain_moves(edges: DataFrame, n_rounds: int = 3) -> DataFrame:
    """(vid, community) after `n_rounds` SYNCHRONOUS modularity-gain
    label moves from singleton init — the data-parallel form of the
    Louvain phase-1 local-move sweep (Blondel et al., J. Stat. Mech.
    2008): each round, every vertex simultaneously adopts the neighbor
    community maximizing

        gain(v → C) = k_{v,C} − deg(v) · (deg(C) − deg(v)·[v ∈ C]) / 2m

    (ties → smallest community id). Sequential Louvain moves one
    vertex at a time — inherently serial — so distributed
    implementations use exactly this synchronous sweep (e.g. Spark
    GraphFrames' and Grappolo's parallel Louvain variants); the cost
    is that simultaneous moves can oscillate on symmetric structures,
    which the fixed-round contract makes deterministic and the oracle
    replays verbatim. Full Louvain iterates sweep → contract
    (`contraction.py` is the contraction the pipeline would reuse) →
    sweep; this operator is the sweep.

    Determinism: k_{v,C}, deg(v), deg(C), and 2m are exact integer
    aggregates; the gain is ONE float expression over them (identical
    on any engine), and the argmax is a map-side-combinable
    max(struct(gain, −community)) — count-desc/label-asc semantics
    with no per-vid window (the round-4 labelprop lesson).

    Scale: per round, one dst-keyed label attach + a (src, community)
    count (per-vid rows ≤ #distinct neighbor communities ≤ degree),
    one community-degree aggregate, and the struct-max pick — all
    map-side combinable; localCheckpoint per round truncates lineage.
    """
    sym = symmetrize(edges).cache()
    deg = sym.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
    m2 = float(deg.agg(F.sum("deg")).collect()[0][0])  # 2m, exact int
    labels = deg.select("vid", F.col("vid").alias("lab")).localCheckpoint(eager=True)
    for _ in range(n_rounds):
        cd = (
            labels.join(deg, "vid")
            .groupBy("lab")
            .agg(F.sum("deg").alias("dc"))
        )
        kv = (
            sym.join(
                labels.select(F.col("vid").alias("dst"), F.col("lab").alias("cand")),
                "dst",
            )
            .groupBy(F.col("src").alias("vid"), "cand")
            .agg(F.count("*").alias("kin"))
        )
        g = (
            kv.join(deg, "vid")
            .join(cd.select(F.col("lab").alias("cand"), "dc"), "cand")
            .join(labels, "vid")
            .select(
                "vid",
                "cand",
                (
                    F.col("kin").cast("double")
                    - F.col("deg").cast("double")
                    * (
                        F.col("dc").cast("double")
                        - F.when(
                            F.col("cand") == F.col("lab"),
                            F.col("deg").cast("double"),
                        ).otherwise(F.lit(0.0))
                    )
                    / F.lit(m2)
                ).alias("g"),
            )
        )
        labels = (
            g.groupBy("vid")
            .agg(F.max(F.struct(F.col("g"), (-F.col("cand")).alias("nc"))).alias("m"))
            .select("vid", (-F.col("m.nc")).alias("lab"))
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    return labels.select("vid", F.col("lab").alias("community"))
