"""Random-walk corpus kernel: validity, determinism, dead-end hold,
and step-choice uniformity.

The walk step is a deterministic hash rank, so two properties carry
the kernel's whole contract: (1) every emitted transition is a real
edge (the distributed join is sound), and (2) over many walk ids the
argmin-hash pick is close to uniform over the neighbor set (the
corpus statistics a skip-gram trainer assumes). Exact replay is
covered by the DuckDB oracle row (graph_walks).
"""

from __future__ import annotations

from collections import Counter

from parrsb_spark import graphs
from parrsb_spark.operators.walks import random_walks


def _by_walk(rows):
    walks = {}
    for r in rows:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["vid"]
    return walks


def test_walks_follow_edges_and_are_deterministic(spark):
    edges = graphs.powerlaw(40, m=2, seed=13)
    df = graphs.to_df(spark, edges)
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    rows1 = random_walks(df, walk_length=5).collect()
    rows2 = random_walks(df, walk_length=5).collect()
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))  # replayable
    walks = _by_walk(rows1)
    assert set(walks) == set(adj)  # one walk per vertex
    for wid, steps in walks.items():
        assert steps[0] == wid
        assert set(steps) == set(range(6))
        for s in range(1, 6):
            assert steps[s] in adj[steps[s - 1]], (wid, s)


def test_walks_hold_at_directed_dead_end(spark):
    # 1→2→3 directed: the walker from 1 reaches the sink and HOLDS
    df = graphs.to_df(spark, [(1, 2), (2, 3)])
    walks = _by_walk(random_walks(df, walk_length=4, directed=True).collect())
    assert [walks[1][s] for s in range(5)] == [1, 2, 3, 3, 3]
    assert [walks[3][s] for s in range(5)] == [3, 3, 3, 3, 3]


def test_walk_step_choice_is_near_uniform(spark):
    # 200 walks from the hub of a 12-leaf star: the argmin-hash pick
    # must spread across leaves like a uniform choice (E = 16.7/leaf)
    edges = graphs.star_hub(12)  # hub = 1, leaves 2..13
    df = graphs.to_df(spark, edges)
    hub = 1
    seeds = spark.createDataFrame(
        [(w, hub) for w in range(200)], "walk_id long, vid long"
    )
    rows = random_walks(df, walk_length=1, seeds=seeds).collect()
    first = Counter(r["vid"] for r in rows if r["step"] == 1)
    assert sum(first.values()) == 200
    assert len(first) == 12  # every leaf reached
    assert all(5 <= c <= 40 for c in first.values()), first


def test_indexed_adjacency_unique_ranks_and_totals(spark):
    """The step join's soundness rests on two index invariants: (src, rnk)
    is a unique key with rnk dense 1..deg(src) in dst order, and deg (the
    grouped_rank total_col, which rides the offsets broadcast instead of
    a degree join) equals the true neighbor count for EVERY row."""
    from parrsb_spark.operators.walks import indexed_adjacency

    edges = graphs.powerlaw(60, m=3, seed=7)
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    rows = indexed_adjacency(graphs.to_df(spark, edges)).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r)
    assert set(by_src) == set(adj)
    for src, rs in by_src.items():
        assert all(r["deg"] == len(adj[src]) for r in rs)
        ranked = sorted(rs, key=lambda r: r["rnk"])
        assert [r["rnk"] for r in ranked] == list(range(1, len(adj[src]) + 1))
        assert [r["dst"] for r in ranked] == sorted(adj[src])
