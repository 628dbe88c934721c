"""Community label propagation — synchronous, deterministic.

The reference's greedy solid/fluid co-partitioner drives the same
dataflow: per-element MAJORITY VOTE of neighbor targets
(`update_frontier`, ref /root/reference/src/parrsb.c:563-615: counts
per candidate, picks the most frequent). Our deterministic tie-break:
highest count first, then smallest label — fully reproducible, so the
SQL oracle can replay it exactly.

Each round: gather neighbor labels (one shuffle), count per (vid,
label), window-pick the argmax. Synchronous update (all vertices move
together) for determinism; fixed round count for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parrsb_spark.functions.spmv import symmetrize
from parrsb_spark.session import iterative_conf
from parrsb_spark.sources.edges import vertices_from_edges


def label_propagation(
    edges: DataFrame,
    n_iter: int = 5,
    vertices: DataFrame | None = None,
    checkpoint_interval: int = 4,
) -> DataFrame:
    """Returns (vid, label) after n_iter synchronous rounds (labels init = vid)."""
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = symmetrize(edges).repartition(n_shuffle, "src").cache()
    verts = (vertices or vertices_from_edges(edges)).select("vid")
    labels = verts.withColumn("label", F.col("vid"))

    # measured-skew AQE gate (see session.iterative_conf): one degree
    # probe on the cached edge side; hub-free graphs skip loop AQE
    from parrsb_spark.config import default_options as _dflt

    mx = sym.groupBy("src").agg(F.count("*").alias("d")).agg(F.max("d")).collect()[0][0]
    w = Window.partitionBy("vid").orderBy(F.desc("cnt"), F.asc("label"))
    # `with` (not a bare __enter__) so an exception inside the loop still
    # restores the session AQE/constraint-propagation conf on exit
    with iterative_conf(spark, disable_aqe=(mx or 0) <= _dflt().salt_degree_threshold):
        for it in range(n_iter):
            nbr = sym.join(labels.select(F.col("vid").alias("src"), "label"), "src").select(
                F.col("dst").alias("vid"), "label"
            )
            counts = nbr.groupBy("vid", "label").agg(F.count("*").alias("cnt"))
            pick = counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select(
                "vid", F.col("label").alias("new_label")
            )
            labels = labels.join(pick, "vid", "left").select(
                "vid", F.coalesce("new_label", "label").alias("label")
            )
            if (it + 1) % checkpoint_interval == 0:
                labels = labels.localCheckpoint(eager=True)
    sym.unpersist()
    return labels
