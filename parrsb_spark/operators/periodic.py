"""Geometric periodic-face matching (the 4-point cyclic alignment).

Reference: `findConnectedPeriodicFaces` pairs every boundary face whose
BC pointer names another face's (elementId, faceId); for each pair
`findConnectedPeriodicPairs` centers both faces (per-dimension mean
removed), searches the nvf cyclic shifts of the REVERSED winding for
the one minimizing the summed squared vertex distance, gates on
tol = 1e-3 · max|coordinate|, and emits per-vertex (max-id → min-id)
alias pairs (ref /root/reference/src/con-periodic.c:107-193). The
alias pairs then feed the gs-min fixpoint + dense renumber
(`renumberPeriodicVertices` / `compressPeriodicVertices`, ref
con-periodic.c:24-105) — here operators/contraction.contract_aliases,
which reuses the exact min-label CC kernel.

Spark-first shape: the face pairing is ONE equi-join on the BC pointer
key (shuffle- or broadcast-hash; never a spatial cross join), and the
shift search unrolls at PLAN BUILD time — nvf is a per-mesh constant
(2 faces-of-quads / 4 faces-of-hexes), so all nvf candidate distances
are JVM column expressions inside whole-stage codegen. No UDF, no
per-row Python.

Pair-orientation divergence (documented): the reference scans faces in
array order and matches ptr[j].bc → ptr[i] only for j > i. A DataFrame
has no array order, so when BOTH faces point at each other the matched
pair would appear twice; we canonicalize with (elem_id, face_id)
ordering instead — same pair set, order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def match_periodic_faces(
    faces: DataFrame,
    nvf: int,
    ndim: int,
    tol_factor: float = 1e-3,
    strict: bool = True,
) -> DataFrame:
    """Returns vertex alias pairs (src = min globalId, dst = max globalId),
    one row per matched face-vertex, deduplicated — ready for
    contraction.contract_aliases.

    `faces` schema: (elem_id long, face_id long, bc_elem long,
    bc_face long, vids array<long>, xs array<array<double>>) where
    vids/xs list the face's nvf vertices in winding order and xs[j] is
    the ndim-vector of vertex j. Non-periodic faces carry bc_elem NULL.

    `strict=True` reproduces the reference's hard failure (ref
    con-periodic.c:158-166): raises ValueError if any matched pair's
    aligned distance exceeds tol (one extra count job); strict=False
    drops unmatched pairs silently (the streaming-friendly form).
    """
    f = faces.select(
        F.col("elem_id").alias("f_elem"),
        F.col("face_id").alias("f_face"),
        F.col("bc_elem").alias("f_bc_elem"),
        F.col("bc_face").alias("f_bc_face"),
        F.col("vids").alias("f_vids"),
        F.col("xs").alias("f_xs"),
    )
    g = faces.filter(F.col("bc_elem").isNotNull()).select(
        F.col("elem_id").alias("g_elem"),
        F.col("face_id").alias("g_face"),
        F.col("bc_elem"),
        F.col("bc_face"),
        F.col("vids").alias("g_vids"),
        F.col("xs").alias("g_xs"),
    )
    # the BC pointer is the join key — an equi-join Catalyst can hash
    # (and broadcast when the boundary-face table is small)
    # coalesce: a pointee with NULL bc would otherwise make the predicate
    # NULL and silently drop the pair (SQL three-valued logic)
    mutual = F.coalesce(
        (F.col("f_bc_elem") == F.col("g_elem"))
        & (F.col("f_bc_face") == F.col("g_face")),
        F.lit(False),
    )
    pairs = g.join(
        f,
        (g["bc_elem"] == f["f_elem"]) & (g["bc_face"] == f["f_face"]),
    ).filter(
        # canonical orientation: when both faces point at each other the
        # join yields the pair twice with roles swapped — keep the row
        # where the pointee sorts first (see module docstring); one-sided
        # pointers appear once and pass through
        ~mutual
        | (F.col("f_elem") < F.col("g_elem"))
        | ((F.col("f_elem") == F.col("g_elem")) & (F.col("f_face") < F.col("g_face")))
    )

    # center both faces: per-dimension mean removed (ref :122-133)
    pairs = pairs.withColumn("f_m", F.array(*_mean_exprs("f_xs", nvf, ndim)))
    pairs = pairs.withColumn("g_m", F.array(*_mean_exprs("g_xs", nvf, ndim)))

    def cpt(side: str, j: int, i: int):
        return F.col(f"{side}_xs")[j][i] - F.col(f"{side}_m")[i]

    # shift search over the reversed winding (ref :135-151): nvf candidate
    # sums, unrolled to constant expressions; argmin via struct array_min
    cands = []
    for s in range(nvf):
        d2 = F.lit(0.0)
        for j in range(nvf):
            k = nvf - 1 - ((j + s) % nvf)
            for i in range(ndim):
                diff = cpt("f", j, i) - cpt("g", k, i)
                d2 = d2 + diff * diff
        cands.append(F.struct(d2.alias("d2"), F.lit(s).alias("s")))
    best = F.array_min(F.array(*cands))
    pairs = pairs.withColumn("_best", best)

    # tolerance gate: 1e-3 · max|coordinate| over both faces (ref :153-166)
    mags = [
        F.abs(F.col(side)[j][i])
        for side in ("f_xs", "g_xs")
        for j in range(nvf)
        for i in range(ndim)
    ]
    pairs = pairs.withColumn(
        "_ok", F.sqrt(F.col("_best.d2")) <= F.lit(tol_factor) * F.greatest(*mags)
    )
    if strict:
        bad = pairs.filter(~F.col("_ok")).select("f_elem", "f_face", "g_elem", "g_face").take(1)
        if bad:
            r = bad[0]
            raise ValueError(
                f"periodic faces did not match within tolerance: "
                f"({r['f_elem']},{r['f_face']}) vs ({r['g_elem']},{r['g_face']})"
            )
    pairs = pairs.filter(F.col("_ok"))

    # emit per-vertex alias pairs at the matched shift (ref :168-174):
    # f vertex i pairs with g vertex (nvf-1-((i+shift)%nvf))
    vps = []
    for i in range(nvf):
        gk = (F.lit(nvf - 1) - ((F.lit(i) + F.col("_best.s")) % nvf)) + 1
        a = F.col("f_vids")[i]
        b = F.element_at("g_vids", gk.cast("int"))
        vps.append(F.struct(F.least(a, b).alias("src"), F.greatest(a, b).alias("dst")))
    return (
        pairs.select(F.explode(F.array(*vps)).alias("p"))
        .select("p.src", "p.dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _mean_exprs(xs_col: str, nvf: int, ndim: int):
    return [
        sum(F.col(xs_col)[j][i] for j in range(nvf)) / float(nvf) for i in range(ndim)
    ]
