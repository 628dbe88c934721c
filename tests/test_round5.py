"""Round-5 regressions: hub-safe labelprop argmax, broadcast-path
boundary tie-break, fused CG reductions, multi-table ANN recall."""

from pyspark.sql import functions as F

from parrsb_spark import graphs
from parrsb_spark.operators.labelprop import label_propagation
from tests.oracles import labelprop_np


# ---------------------------------------------------------------------------
# labelprop: struct-max argmax (no per-vid window funnel)


def test_labelprop_star_hub_matches_oracle(spark):
    """A star's center sees every leaf label at once — the shape whose
    count rows would all land on ONE window task under the old
    row_number pick. The struct-max pick must reproduce the oracle's
    count-desc / label-asc semantics exactly."""
    edges = graphs.star_hub(60)
    df = graphs.to_df(spark, edges)
    got = {r["vid"]: r["label"] for r in label_propagation(df, n_iter=3).collect()}
    assert got == labelprop_np(edges, n_iter=3)


def test_labelprop_plan_has_no_window(spark):
    """The loop plan must contain NO window node: the argmax is a
    map-side-combinable aggregate (AQE can split a skewed aggregate;
    it cannot split a window key)."""
    df = graphs.to_df(spark, graphs.grid2d(4, 3)[0])
    out = label_propagation(df, n_iter=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan
    assert "Window" not in plan
