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

from parrsb_spark.functions.spmv import degrees


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
