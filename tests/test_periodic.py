"""Geometric periodic-face matching (ref src/con-periodic.c:107-193)
+ phase-timer lineage rows (ref src/metrics.c:68-106)."""

import pytest
from pyspark.sql import functions as F

from parrsb_spark import graphs
from parrsb_spark.operators.contraction import contract_aliases
from parrsb_spark.operators.periodic import match_periodic_faces

F_V = [1, 2, 3, 4]
F_X = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [0.0, 1.0, 0.0]]
# mate at z=5 with reversed + rotated winding: the alignment search must
# recover the rotation, not assume index order
G_V = [14, 13, 12, 11]
G_X = [[0.0, 1.0, 5.0], [1.0, 1.0, 5.0], [1.0, 0.0, 5.0], [0.0, 0.0, 5.0]]
EXPECT_3D = [(1, 11), (2, 12), (3, 13), (4, 14)]


def test_match_2d_grid_wraps_cylinder(spark):
    nx, ny = 4, 3
    faces = spark.createDataFrame(
        graphs.grid2d_periodic_faces(nx, ny), schema=graphs.FACES_SCHEMA
    )
    rows = sorted(
        (r["src"], r["dst"]) for r in match_periodic_faces(faces, nvf=2, ndim=2).collect()
    )
    # left column vid y*(nx+1)+1 aliases right column vid y*(nx+1)+nx+1
    assert rows == sorted((y * (nx + 1) + 1, y * (nx + 1) + nx + 1) for y in range(ny + 1))

    # contraction glues the mesh vertex graph into a cylinder
    e = graphs.to_df(spark, graphs.grid2d(nx + 1, ny + 1)[0])
    _, mapping = contract_aliases(e, match_periodic_faces(faces, nvf=2, ndim=2))
    assert mapping.select("canon").distinct().count() == nx * (ny + 1)


def test_match_3d_rotated_reversed_winding(spark):
    faces = spark.createDataFrame(
        [(1, 6, 2, 5, F_V, F_X), (2, 5, None, None, G_V, G_X)],
        schema=graphs.FACES_SCHEMA,
    )
    p3 = sorted(
        (r["src"], r["dst"]) for r in match_periodic_faces(faces, nvf=4, ndim=3).collect()
    )
    assert p3 == EXPECT_3D


def test_mutual_pointers_emit_pair_once(spark):
    faces = spark.createDataFrame(
        [(1, 6, 2, 5, F_V, F_X), (2, 5, 1, 6, G_V, G_X)], schema=graphs.FACES_SCHEMA
    )
    p = sorted(
        (r["src"], r["dst"]) for r in match_periodic_faces(faces, nvf=4, ndim=3).collect()
    )
    assert p == EXPECT_3D


def test_strict_tolerance_gate_raises(spark):
    bent = [[0.0, 1.0, 5.0], [1.0, 1.0, 5.0], [1.0, 0.0, 5.0], [0.3, 0.2, 5.0]]
    faces = spark.createDataFrame(
        [(1, 6, 2, 5, F_V, F_X), (2, 5, None, None, G_V, bent)],
        schema=graphs.FACES_SCHEMA,
    )
    with pytest.raises(ValueError, match="did not match"):
        match_periodic_faces(faces, nvf=4, ndim=3)
    # non-strict drops the bad pair instead
    assert match_periodic_faces(faces, nvf=4, ndim=3, strict=False).count() == 0


def test_matcher_plan_is_equi_join_no_udf(spark):
    """The pairing must be a hash-able equi-join with the shift search in
    codegen — no BroadcastNestedLoopJoin / CartesianProduct, no
    Python UDF (BatchEvalPython/ArrowEvalPython)."""
    faces = spark.createDataFrame(
        graphs.grid2d_periodic_faces(6, 4), schema=graphs.FACES_SCHEMA
    )
    plan = (
        match_periodic_faces(faces, nvf=2, ndim=2, strict=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "EvalPython"):
        assert bad not in plan, f"{bad} in matcher plan"


# ---------------------------------------------------------------------------
# phase-timer lineage (metric_rsb_print analogue)


def test_rsb_phase_rows_and_report(spark, tmp_path):
    from parrsb_spark.config import EngineOptions
    from parrsb_spark.operators.rsb import rsb_partition
    from parrsb_spark.plans.lineage import LineageLog, format_phase_report, phase_report

    e = graphs.to_df(spark, graphs.grid2d(8, 4)[0])
    lin = LineageLog(spark, str(tmp_path / "lin"))
    opts = EngineOptions(rsb_max_iter=8, rsb_max_passes=1)
    parts = rsb_partition(e, 4, opts=opts, lineage=lin)
    assert parts.select("part").distinct().count() == 4

    rep = {(int(r["iteration"]), r["phase"]): r for r in phase_report(lin.read()).collect()}
    # k=4 → 2 cut levels, each with the driver phases
    for lvl in (0, 1):
        for ph in ("pre", "fiedler", "sort", "checkpoint"):
            assert (lvl, ph) in rep, f"missing phase {ph} at level {lvl}"
        assert rep[(lvl, "fiedler")]["max_s"] > 0.0
    frep = {
        (int(r["iteration"]), r["phase"]): r
        for r in phase_report(lin.read(), kernel="fiedler").collect()
    }
    for lvl in (0, 1):
        for ph in ("fiedler_setup", "lanczos", "tqli", "niter"):
            assert (lvl, ph) in frep
        assert frep[(lvl, "niter")]["count_avg"] > 0  # the iteration counter

    txt = format_phase_report(lin.read())
    assert "level=00" in txt and "level=01" in txt and "FIEDLER" in txt
    # ordinary per-cut rows coexist, untouched by phase rows
    plain = lin.read().filter(F.col("kernel") == "rsb")
    assert plain.count() > 0
