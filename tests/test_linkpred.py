"""Link-prediction scores vs a brute-force Python oracle.

Fixture topologies hit what the kernel can get wrong: a bridge between
cliques (the classic "predicted edge" — both endpoints share the two
bridge-adjacent cliques' members), a star hub (every leaf pair's only
common neighbor is the hub — and with chunk_size smaller than the hub
degree the chunk-salted enumeration must still count each pair exactly
once), a power-law graph (mixed degrees, adjacent-and-non-adjacent
candidates), and a square grid (4-cycles: non-adjacent diagonal pairs
with exactly two common neighbors).
"""

from __future__ import annotations

import math

import pytest

from parrsb_spark import graphs
from parrsb_spark.operators.linkpred import link_prediction_scores


def _brute(edges, min_common=1, include_existing=False, max_center_degree=None):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    vs = sorted(adj)
    for i, u in enumerate(vs):
        for v in vs[i + 1 :]:
            common = adj[u] & adj[v]
            if max_center_degree is not None:
                common = {c for c in common if len(adj[c]) <= max_center_degree}
            cn = len(common)
            if cn < min_common:
                continue
            if not include_existing and v in adj[u]:
                continue
            out[(u, v)] = (
                cn,
                cn / (len(adj[u]) + len(adj[v]) - cn),
                sum(1.0 / math.log(len(adj[c])) for c in common),
                sum(1.0 / len(adj[c]) for c in common),
            )
    return out


def _collect(df):
    return {
        (r["u"], r["v"]): (r["cn"], r["jaccard"], r["adamic_adar"], r["resource_alloc"])
        for r in df.collect()
    }


GRAPHS = {
    "bridge": graphs.two_cliques_bridge(5),
    "star": graphs.star_hub(9),
    "plaw": graphs.powerlaw(40, m=3, seed=7),
    "grid": graphs.grid2d(4, 4)[0],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_linkpred_matches_brute(spark, name):
    edges = GRAPHS[name]
    got = _collect(link_prediction_scores(graphs.to_df(spark, edges)))
    exp = _brute(edges)
    assert set(got) == set(exp)
    for pair, (cn, jac, aa, ra) in exp.items():
        g = got[pair]
        assert g[0] == cn, pair
        assert g[1] == pytest.approx(jac, abs=1e-12), pair
        assert g[2] == pytest.approx(aa, abs=1e-9), pair
        assert g[3] == pytest.approx(ra, abs=1e-9), pair


def test_linkpred_include_existing_scores_known_edges(spark):
    edges = GRAPHS["plaw"]
    got = _collect(
        link_prediction_scores(graphs.to_df(spark, edges), include_existing=True)
    )
    exp = _brute(edges, include_existing=True)
    assert set(got) == set(exp)
    # the evaluation mode must strictly extend the prediction mode
    sub = set(_collect(link_prediction_scores(graphs.to_df(spark, edges))))
    assert sub < set(got)


def test_linkpred_min_common_filters(spark):
    edges = GRAPHS["grid"]
    got = _collect(link_prediction_scores(graphs.to_df(spark, edges), min_common=2))
    exp = _brute(edges, min_common=2)
    assert set(got) == set(exp)
    assert all(cn >= 2 for cn, *_ in got.values())


def test_linkpred_hub_chunking_invariant(spark):
    """chunk_size below the hub degree must not change any score —
    the chunk-salted wedge enumeration counts each pair exactly once
    (the mirror_pairs star-hub guarantee, inherited via chunked_wedges)."""
    edges = GRAPHS["star"]
    df = graphs.to_df(spark, edges)
    base = _collect(link_prediction_scores(df))
    salted = _collect(link_prediction_scores(df, chunk_size=4))
    assert set(base) == set(salted)
    for pair in base:
        assert base[pair][0] == salted[pair][0]
        for a, b in zip(base[pair][1:], salted[pair][1:]):
            assert a == pytest.approx(b, abs=1e-9)
    # every leaf pair shares exactly the hub
    exp = _brute(edges)
    assert all(cn == 1 for cn, *_ in exp.values())
    assert set(base) == set(exp)


def test_linkpred_center_degree_cap(spark):
    """max_center_degree drops the star hub as a wedge center: the
    star's only wedges go through the hub, so the capped candidate set
    is EMPTY; on the power-law graph the capped scores must equal the
    brute oracle that ignores over-cap common neighbors (endpoint
    degrees for jaccard stay true degrees)."""
    star = graphs.to_df(spark, GRAPHS["star"])
    assert link_prediction_scores(star, max_center_degree=4).count() == 0

    edges = GRAPHS["plaw"]
    got = _collect(
        link_prediction_scores(graphs.to_df(spark, edges), max_center_degree=6)
    )
    exp = _brute(edges, max_center_degree=6)
    assert set(got) == set(exp)
    for pair, (cn, jac, aa, ra) in exp.items():
        g = got[pair]
        assert g[0] == cn, pair
        assert g[1] == pytest.approx(jac, abs=1e-12), pair
        assert g[2] == pytest.approx(aa, abs=1e-9), pair
        assert g[3] == pytest.approx(ra, abs=1e-9), pair


def test_linkpred_plan_jvm_side_no_window(spark):
    from tests.test_plan_shapes_r5 import BAD_JOINS, _plan

    plan = _plan(link_prediction_scores(graphs.to_df(spark, GRAPHS["plaw"])))
    for bad in BAD_JOINS + ("EvalPython", "Window"):
        assert bad not in plan, f"{bad} in linkpred plan"


def test_linkpred_scores_bitwise_deterministic(spark):
    """The float scores must be BITWISE identical across different
    input partitionings (the round-5 flake: a plain F.sum of double
    terms follows shuffle arrival order, and one of three identical
    sf0.01 boards flipped an oracle hash at a rounding boundary; the
    ordered (cd, k) fold removes the order dependence entirely)."""
    edges = graphs.powerlaw(60, m=4, seed=13)
    base = spark.createDataFrame(edges, "src long, dst long")
    runs = []
    for parts, shuffled in [(1, False), (7, True), (32, True)]:
        df = base
        if shuffled:
            df = df.orderBy("dst", "src")  # different row order into the agg
        df = df.repartition(parts)
        got = {
            (r["u"], r["v"]): (r["cn"], r["jaccard"], r["adamic_adar"], r["resource_alloc"])
            for r in link_prediction_scores(df, min_common=1).collect()
        }
        runs.append(got)
    assert runs[0] == runs[1] == runs[2]  # exact ==, no tolerance
    # and still correct vs the brute oracle (tolerance-free integers,
    # allclose floats)
    brute = _brute(edges)
    assert set(runs[0]) == set(brute)
    for k, (cn, ja, aa, ra) in brute.items():
        g = runs[0][k]
        assert g[0] == cn
        assert abs(g[1] - ja) < 1e-12 and abs(g[2] - aa) < 1e-12 and abs(g[3] - ra) < 1e-12
