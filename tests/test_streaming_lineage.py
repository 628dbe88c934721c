"""Structured Streaming parity + checkpoint/resume protocol."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parrsb_spark import graphs
from parrsb_spark.operators.pagerank import pagerank
from parrsb_spark.plans.lineage import LineageLog, latest_checkpoint, pagerank_resumable
from parrsb_spark.streaming.events import (
    sessionize_batch,
    windowed_agg_batch,
    windowed_agg_stream,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events(spark, n=500):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            t0 + datetime.timedelta(minutes=7 * i % (60 * 24)),
            i % 13,
            ["click", "view", "buy"][i % 3],
            float(i % 10),
            "{}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema=EVENT_SCHEMA)


def test_stream_matches_batch(spark, tmp_path):
    """The streaming windowed agg must equal the batch form on the same
    rows (memory sink driven to completion)."""
    ev = _events(spark)
    pdir = str(tmp_path / "events_parquet")
    ev.write.parquet(pdir)
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_agg_batch(spark.read.parquet(pdir)).collect()
    }
    q = windowed_agg_stream(spark, pdir, EVENT_SCHEMA, query_name="t_out")
    try:
        q.processAllAvailable()
        stream = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM t_out").collect()
        }
    finally:
        q.stop()
    assert stream == batch


def test_sessionize(spark):
    ev = _events(spark, 200)
    got = {r["user_id"]: r["n_sessions"] for r in sessionize_batch(ev, gap_minutes=30).collect()}
    assert got and all(v >= 1 for v in got.values())
    # deterministic under repartition
    got2 = {
        r["user_id"]: r["n_sessions"]
        for r in sessionize_batch(ev.repartition(5), gap_minutes=30).collect()
    }
    assert got == got2


def test_pagerank_resume_identical(spark, tmp_path):
    """North rule: resumable from checkpoint — interrupted-then-resumed
    equals uninterrupted, bit-for-bit."""
    edges = graphs.powerlaw(80, m=2, seed=42)
    df = graphs.to_df(spark, edges)
    straight = {r["vid"]: r["pr"] for r in pagerank(df, fixed_iters=6).collect()}

    ck = str(tmp_path / "ck")
    # phase 1: run 4 iterations, snapshotting every 2 → last snapshot iter=3
    pagerank_resumable(spark, df, ck, total_iters=4, snapshot_every=2)
    it, _ = latest_checkpoint(spark, ck, "pagerank")
    assert it == 3
    # phase 2: resume and continue to 6 total
    final = {
        r["vid"]: r["pr"]
        for r in pagerank_resumable(spark, df, ck, total_iters=6, snapshot_every=2).collect()
    }
    assert set(final) == set(straight)
    for v in straight:
        assert abs(final[v] - straight[v]) < 1e-15


def test_lineage_rows_schema(spark, tmp_path):
    log = LineageLog(spark, str(tmp_path / "lin"))
    log.record(kernel="rsb", iteration=0, partition_id=1, residual=0.5, rows=100)
    log.record(kernel="rsb", iteration=1, partition_id=1, residual=0.1, rows=100)
    rows = log.read().orderBy("iteration").collect()
    assert [r["iteration"] for r in rows] == [0, 1]
    assert rows[0]["run_id"] == log.run_id
    assert set(log.read().columns) == {
        "run_id", "kernel", "partition_id", "iteration", "residual", "rows", "wall_s"
    }
