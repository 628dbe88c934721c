"""Physical-plan shape guards for the round-5 composition kernels.

Same discipline as test_periodic.test_matcher_plan_is_equi_join_no_udf:
the declarative kernels must stay entirely JVM-side (no Python UDF
nodes) and never degrade to a cartesian/nested-loop join, and the
clustering coefficient — a pure single-plan composition — must also
carry no Window node (the hub-funnel shape the labelprop fix removed).
For the iterative kernels (bfs, sssp) the returned DataFrame is a union
over localCheckpointed rounds, so the guard covers the final plan; the
per-round bodies are built from the same column expressions it shows.
"""

from __future__ import annotations

from parrsb_spark import graphs
from parrsb_spark.operators.bfs import bfs_distances
from parrsb_spark.operators.sssp import sssp
from parrsb_spark.operators.triangles import clustering_coefficients

BAD_JOINS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_lcc_plan_jvm_side_no_window(spark):
    df = graphs.to_df(spark, graphs.powerlaw(60, m=2, seed=5))
    plan = _plan(clustering_coefficients(df))
    for bad in BAD_JOINS + ("EvalPython", "Window"):
        assert bad not in plan, f"{bad} in lcc plan"


def test_bfs_final_plan_no_python(spark):
    edges = graphs.powerlaw(40, m=2, seed=2)
    df = graphs.to_df(spark, edges)
    seeds = spark.createDataFrame([(min(u for u, _ in edges),)], schema="vid long")
    plan = _plan(bfs_distances(df, seeds, max_hops=4))
    for bad in BAD_JOINS + ("EvalPython",):
        assert bad not in plan, f"{bad} in bfs plan"


def test_anf_final_plan_no_python_no_window(spark):
    from parrsb_spark.operators.anf import anf_masks

    df = graphs.to_df(spark, graphs.powerlaw(50, m=2, seed=3))
    plan = _plan(anf_masks(df, n_hops=3, n_sketches=4))
    for bad in BAD_JOINS + ("EvalPython", "Window"):
        assert bad not in plan, f"{bad} in anf plan"


def test_modularity_plan_no_python_no_window(spark):
    from parrsb_spark.operators.community import modularity_by_community

    edges = graphs.powerlaw(50, m=2, seed=3)
    df = graphs.to_df(spark, edges)
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    labels = spark.createDataFrame([(v, v % 3) for v in verts], "vid long, label long")
    plan = _plan(modularity_by_community(df, labels))
    # the only nested-loop is the broadcast 1-row m attach (the
    # dangling-mass pattern) — assert no Python/Window and no
    # non-broadcast cartesian
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_walks_final_plan_no_python_no_window(spark):
    from parrsb_spark.operators.walks import random_walks

    df = graphs.to_df(spark, graphs.powerlaw(40, m=2, seed=3))
    plan = _plan(random_walks(df, walk_length=3))
    for bad in BAD_JOINS + ("EvalPython", "Window"):
        assert bad not in plan, f"{bad} in walks plan"


def test_sssp_final_plan_no_python(spark):
    edges = graphs.powerlaw(40, m=2, seed=2)
    wdf = spark.createDataFrame(
        [(int(u), int(v), (u + v) % 5 + 1) for u, v in edges], schema="src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(min(u for u, _ in edges),)], schema="vid long")
    plan = _plan(sssp(wdf, seeds, max_rounds=4))
    for bad in BAD_JOINS + ("EvalPython",):
        assert bad not in plan, f"{bad} in sssp plan"
