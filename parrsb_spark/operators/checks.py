"""Graph sanity checks (ref /root/reference/src/con-check.c).

- `duplicate_out_links` — analogue of `element_check` (:265-288): every
  element must reference nv DISTINCT vertices → every page's outlink
  list must not contain duplicates (pre-dedup detection).
- `mirror_pairs` — analogue of `face_check` (:197-263): an element pair
  sharing ≥3 vertices is an error → vertex pairs sharing ≥ threshold
  common neighbors are suspicious mirrors. Same wedge-join shape as
  triangle counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parrsb_spark.functions.spmv import symmetrize


def duplicate_out_links(links: DataFrame) -> DataFrame:
    """links = (src_url, dst_url) pre-dedup → rows with count > 1."""
    return (
        links.groupBy("src_url", "dst_url")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def mirror_pairs(edges: DataFrame, min_shared: int = 3) -> DataFrame:
    """(u, v, shared) — vertex pairs with ≥ min_shared common neighbors.

    Wedge self-join on the shared neighbor, u < v to count each pair
    once (the exact shape of ref getVToEMap + face_check)."""
    sym = symmetrize(edges)
    a = sym.select(F.col("src").alias("nbr"), F.col("dst").alias("u"))
    b = sym.select(F.col("src").alias("nbr"), F.col("dst").alias("v"))
    return (
        a.join(b, "nbr")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
