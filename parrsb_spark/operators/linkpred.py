"""Link prediction over common-neighbor structure — the classic
webgraph "which edges are missing" kernel (Liben-Nowell & Kleinberg,
"The Link-Prediction Problem for Social Networks", CIKM'03): for every
non-adjacent candidate pair (u, v) sharing at least `min_common`
neighbors, the standard neighborhood scores

- cn             — |N(u) ∩ N(v)|, the raw common-neighbor count
- jaccard        — cn / |N(u) ∪ N(v)|
- adamic_adar    — Σ_{c ∈ N(u)∩N(v)} 1 / ln(deg(c))
- resource_alloc — Σ_{c ∈ N(u)∩N(v)} 1 / deg(c)

This completes the structural-similarity family next to `mirror_pairs`
(ref /root/reference/src/con-check.c:197-263 — the shared-vertex pair
census whose Spark shape both reuse): mirror_pairs thresholds the raw
count as a sanity check, link prediction weights each shared neighbor
by its selectivity and scores the non-edges.

Scale design:
- wedge enumeration is `chunked_wedges` (operators/checks.py) — the
  chunk-salted self-join that splits a degree-d hub's C(d,2) wedge
  expansion across ⌈d/chunk_size⌉² tasks instead of funneling it into
  the one task owning join key c; see its docstring for the skew
  analysis. The center degree rides along from the enumerator, so the
  AA/RA weights cost ZERO extra joins on the hub-keyed column.
- the per-pair reduce is a TWO-LEVEL aggregate: (u, v, cd) → exact
  integer counts (map-side combined), then per (u, v) an ordered fold
  over the distinct center degrees, summing k/ln(d) and k/d in
  ascending-d order. Integer counts commute exactly, and the float
  fold runs in ONE fixed order, so the scores are bitwise identical
  run-to-run regardless of partitioning/shuffle arrival — a plain
  F.sum of per-wedge double terms is not (double addition is not
  associative; the reduce order follows shuffle arrival). That
  nondeterminism flipped a round-10-digit oracle hash exactly once in
  three otherwise-identical runs at sf0.01 before this design; the
  fixed-order fold also makes resume/replay comparisons exact. The
  fold array holds ≤ #distinct degrees among the pair's common
  neighbors — far smaller than cn itself on skewed graphs.
- the endpoint-degree attach for jaccard is two equi-joins against the
  |V|-row degree table; a popular endpoint skews the join key, which
  AQE's skew-join split handles (join skew is divisible, unlike window
  keys — the labelprop lesson from round 4).
- candidate generation is inherently Θ(Σ_c C(deg(c), 2)); at webgraph
  scale callers bound it with `max_center_degree` — the same
  document-frequency cap as `dedup.ngram_jaccard_pairs`: a center
  above the cap contributes NO wedges. This is the standard semantic
  trade at scale, not just a cost trade — a 10^6-degree hub (the
  "google.com" center) is shared by everyone, carries an Adamic-Adar
  weight of 1/ln(10^6) ≈ 0.07 per pair, and says nothing about which
  specific pairs should link; dropping it removes Θ(d²) cost and only
  noise signal. `min_common` then bounds the OUTPUT (the HAVING pushes
  into the aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parrsb_spark.functions.spmv import symmetrize
from parrsb_spark.operators.checks import chunked_wedges


def link_prediction_scores(
    edges: DataFrame,
    min_common: int = 1,
    include_existing: bool = False,
    chunk_size: int = 1 << 13,
    max_center_degree: int | None = None,
) -> DataFrame:
    """(u, v, cn, jaccard, adamic_adar, resource_alloc) for candidate
    pairs u < v with ≥ min_common common neighbors in the symmetrized
    graph. Existing edges are anti-joined away unless
    `include_existing` (scoring known edges is the evaluation mode:
    rank held-out edges against non-edges). With `max_center_degree`
    set, centers above the cap contribute no wedges (cn/jaccard/scores
    then count only sub-cap common neighbors — the df-cap semantics;
    endpoint degrees for jaccard stay TRUE degrees).

    deg(c) ≥ 2 for every wedge center (it has two distinct neighbors
    in the wedge), so ln(deg(c)) > 0 — adamic_adar is always finite.
    """
    sym = symmetrize(edges)
    wedges = chunked_wedges(sym, chunk_size, max_center_degree=max_center_degree)
    pairs = wedges.select(
        F.least("u", "v").alias("u"),
        F.greatest("u", "v").alias("v"),
        F.col("cd"),
    )
    # Level 1: exact integer pre-reduce per (pair, center degree).
    terms = pairs.groupBy("u", "v", "cd").agg(F.count("*").alias("k"))
    # Level 2: cn is an exact integer sum; the float scores fold the
    # (cd, k) terms in ascending-cd order — deterministic, see module
    # docstring. cd values are distinct within a group, so sort_array
    # on struct(cd, k) is a total order.
    fold = F.sort_array(F.collect_list(F.struct("cd", "k")))
    scores = (
        terms.groupBy("u", "v")
        .agg(F.sum("k").alias("cn"), fold.alias("tk"))
        .filter(F.col("cn") >= min_common)
        .select(
            "u",
            "v",
            "cn",
            F.aggregate(
                "tk",
                F.lit(0.0),
                lambda acc, t: acc
                + t["k"].cast("double") / F.log(t["cd"].cast("double")),
            ).alias("adamic_adar"),
            F.aggregate(
                "tk",
                F.lit(0.0),
                lambda acc, t: acc + t["k"].cast("double") / t["cd"].cast("double"),
            ).alias("resource_alloc"),
        )
    )
    deg = sym.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
    scores = (
        scores.join(deg.select(F.col("vid").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("vid").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            "u",
            "v",
            "cn",
            (
                F.col("cn").cast("double")
                / (F.col("du") + F.col("dv") - F.col("cn")).cast("double")
            ).alias("jaccard"),
            "adamic_adar",
            "resource_alloc",
        )
    )
    if not include_existing:
        existing = sym.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        ).distinct()
        scores = scores.join(existing, ["u", "v"], "left_anti")
    return scores
