"""Two-level (node-aware) RSB at bench scale vs the flat k-way driver.

Measures, on the deterministic power-law synthgraph (identical bytes
every run), for nodes×rpn = k:
- `rsb_partition_two_level(nodes, rpn)`: wall, per-level per-cut walls
  (lineage tags rsb_l1 / rsb_l2), Spark job + stage counts per level;
- flat `rsb_partition(k)`: wall, per-cut walls, job/stage counts;
- `two_level_stats` for BOTH part maps under node = part // rpn — the
  inter-node / intra-node cut split (the reference's two-level payoff:
  few expensive network cuts, many cheap shared-memory cuts, ref
  src/parrsb.c:186-234).

Job/stage counts come from the public status tracker over a job group
(variance-immune on this box — see BENCH_IDLE_r04.json protocol note).

Usage: python tools/two_level_probe.py [graph.parquet] [cpus] [nodes] [rpn] [mode]
  mode ∈ both|two|flat|concurrency
  concurrency: nodes=2 vs nodes=8 on a SMALL slice — asserts the level-2
  job count is constant in the node count (the grouped driver's design
  claim; the 64M wall numbers ride mode=both).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import pyspark.sql.functions as F  # noqa: E402 (path shim above)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_grouped(spark, group, fn):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    t0 = time.time()
    try:
        out = fn()
    finally:
        sc.setJobGroup("", "")
    wall = time.time() - t0
    st = sc.statusTracker()
    jobs = st.getJobIdsForGroup(group)
    stages = 0
    for j in jobs:
        info = st.getJobInfo(j)
        stages += len(info.stageIds) if info else 0
    return out, round(wall, 2), len(jobs), stages


def _per_cut(lin, tag):
    rows = [r for r in lin.read().collect() if r["kernel"] == tag]
    cuts = sorted({int(r["iteration"]): float(r["wall_s"]) for r in rows}.items())
    out, prev = [], 0.0
    for _it, w in cuts:
        out.append(round(w - prev, 2))
        prev = w
    return out


def _phases(lin, tag):
    out = {}
    for r in lin.read().collect():
        if r["kernel"].startswith(tag + "/"):
            name = r["kernel"].split("/", 1)[1]
            if name != "niter":
                out[f'{int(r["iteration"])}:{name}'] = round(float(r["wall_s"]), 2)
    return out


def main():
    graph = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/powerlaw_4m.parquet"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    nodes = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rpn = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    mode = sys.argv[5] if len(sys.argv) > 5 else "both"

    from parrsb_spark.config import EngineOptions
    from parrsb_spark.operators.hierarchy import rsb_partition_two_level, two_level_stats
    from parrsb_spark.operators.rsb import rsb_partition
    from parrsb_spark.plans.lineage import LineageLog
    from parrsb_spark.session import get_spark
    from parrsb_spark.sources.synthgraph import materialize_parquet

    spark = get_spark(
        master=f"local[{cpus}]", app_name="two-level-probe", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    opts = EngineOptions(rsb_max_iter=10, rsb_max_passes=1, rsb_tol=1e-4)

    if mode == "concurrency":
        # small slice: the LEVEL-2 job/stage count must be constant in the
        # node count (every node's interior rides ONE grouped solve — the
        # comm_split analogue). Job counts are scale-independent signals,
        # so this is measured small on purpose; level 2 runs under its own
        # job group so level 1's (legitimately node-count-dependent) cuts
        # don't pollute the count.
        small = materialize_parquet("/root/repo/.bench/powerlaw_small.parquet", n=60_000, m=8)
        edges = spark.read.parquet(small).cache()
        edges.count()
        rows = []
        for nn in (2, 8):
            node_map = rsb_partition(edges, nn, opts=opts).localCheckpoint(eager=True)
            _, wall, jobs, stages = _run_grouped(
                spark,
                f"level2_n{nn}",
                lambda nm=node_map: rsb_partition(edges, rpn, seed_parts=nm, opts=opts)
                .groupBy("part")
                .count()
                .collect(),
            )
            rows.append(
                {
                    "nodes": nn,
                    "rpn": rpn,
                    "level2_wall_s": wall,
                    "level2_jobs": jobs,
                    "level2_stages": stages,
                }
            )
        print(
            json.dumps(
                {"kernel": "two_level_concurrency", "edges": edges.count(), "runs": rows}
            )
        )
        spark.stop()
        return

    materialize_parquet(graph, n=4_000_000, m=16, seed=42)
    edges = spark.read.parquet(graph).cache()
    m = edges.count()
    k = nodes * rpn
    out = {"kernel": "two_level_scale", "edges": m, "nodes": nodes, "rpn": rpn, "k": k}

    if mode in ("both", "two"):
        lin2 = LineageLog(spark, tempfile.mkdtemp(prefix="tl_two_"))
        parts2, wall2, jobs2, stages2 = _run_grouped(
            spark,
            "two_level",
            lambda: rsb_partition_two_level(edges, nodes, rpn, opts=opts, lineage=lin2)
            .localCheckpoint(eager=True),
        )
        sz = parts2.groupBy("part").count().agg(
            F.min("count").alias("mn"), F.max("count").alias("mx"), F.count("*").alias("np")
        ).collect()[0]
        stats2 = two_level_stats(edges, parts2.select("vid", "part"), rpn)
        out["two_level"] = {
            "wall_s": wall2,
            "jobs": jobs2,
            "stages": stages2,
            "n_parts": int(sz["np"]),
            "part_min": int(sz["mn"]),
            "part_max": int(sz["mx"]),
            "per_cut_wall_l1_s": _per_cut(lin2, "rsb_l1"),
            "per_cut_wall_l2_s": _per_cut(lin2, "rsb_l2"),
            "phase_walls_l1_s": _phases(lin2, "rsb_l1"),
            "phase_walls_l2_s": _phases(lin2, "rsb_l2"),
            **stats2,
        }

    if mode in ("both", "flat"):
        linf = LineageLog(spark, tempfile.mkdtemp(prefix="tl_flat_"))
        partsf, wallf, jobsf, stagesf = _run_grouped(
            spark,
            "flat",
            lambda: rsb_partition(edges, k, opts=opts, lineage=linf).localCheckpoint(
                eager=True
            ),
        )
        szf = partsf.groupBy("part").count().agg(
            F.min("count").alias("mn"), F.max("count").alias("mx"), F.count("*").alias("np")
        ).collect()[0]
        statsf = two_level_stats(edges, partsf, rpn)
        out["flat"] = {
            "wall_s": wallf,
            "jobs": jobsf,
            "stages": stagesf,
            "n_parts": int(szf["np"]),
            "part_min": int(szf["mn"]),
            "part_max": int(szf["mx"]),
            "per_cut_wall_s": _per_cut(linf, "rsb"),
            **statsf,
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
