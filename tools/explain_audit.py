"""Plan-quality audit: print formatted physical plans for key queries and
grep the scale-critical properties (pushed filters, pruned schemas,
broadcast joins, whole-stage codegen spans).

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

CHECKS = {
    "pricing_summary": ["PushedFilters", "ReadSchema"],
    "top_revenue_orders": ["BroadcastHashJoin"],
    "graph_edges": ["ReadSchema"],
    "docs_token_count": ["ReadSchema"],
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from parrsb_spark import entry_queries as EQ
    from parrsb_spark.session import get_spark

    spark = get_spark(master="local[4]", app_name="explain-audit", shuffle_partitions=4)
    qs = EQ.queries()
    failures = []
    for name, wanted in CHECKS.items():
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        print(f"===== {name} =====")
        # show scan + join lines only (full plans are long)
        for line in plan.splitlines():
            if re.search(r"Scan parquet|PushedFilters|ReadSchema|BroadcastHashJoin|SortMergeJoin|WholeStageCodegen", line):
                print("  ", line.strip()[:160])
        for token in wanted:
            if token not in plan:
                failures.append(f"{name}: missing {token}")
    # targeted assertions
    plan = qs["pricing_summary"](spark, sf_dir)
    p = plan._sc._jvm.PythonSQLUtils.explainString(plan._jdf.queryExecution(), "formatted")
    if "l_shipdate" not in p.split("PushedFilters")[1][:200]:
        failures.append("pricing_summary: shipdate filter not pushed to parquet scan")
    # column pruning: token_count must not read lang/source columns
    p2df = qs["docs_token_count"](spark, sf_dir)
    p2 = p2df._sc._jvm.PythonSQLUtils.explainString(p2df._jdf.queryExecution(), "formatted")
    m = re.search(r"ReadSchema: ([^\n]*)", p2)
    if m and ("lang" in m.group(1) or "source" in m.group(1)):
        failures.append("docs_token_count: unused columns not pruned")
    # no single-partition Exchange (the driver-funnel scale-killer) in the
    # dense-numbering paths: a global no-partition Window would show up as
    # Exchange SinglePartition feeding a Sort+Window
    for qname in ("pages_edges", "graph_cc_dense", "emb_neardup"):
        qdf = qs[qname](spark, sf_dir)
        qp = qdf._sc._jvm.PythonSQLUtils.explainString(qdf._jdf.queryExecution(), "formatted")
        for i, line in enumerate(qp.splitlines()):
            if "Exchange SinglePartition" in line and "Window" in qp[qp.index(line):][:2000]:
                # allow the tiny per-partition-offset scan (input = one row
                # per shuffle partition), flag anything windowing real rows
                ctx = qp.splitlines()[max(0, i - 3):i + 6]
                if not any("_cnt" in c or "_pid" in c for c in ctx):
                    failures.append(f"{qname}: SinglePartition exchange feeding a Window")
    # flagship spectral plans: every row_number window must rank within a
    # physical range partition (_pid), never a whole (grp)/(part) group in
    # one task — the round-2 scale-killer. (A partitionBy(grp) funnel is
    # hash partitioning with one populated key, so the SinglePartition
    # check above can never catch it; inspect the window spec itself.)
    from parrsb_spark import graphs
    from parrsb_spark.config import EngineOptions
    from parrsb_spark.operators.fiedler import fiedler
    from parrsb_spark.operators.rsb import rsb_partition

    gdf = graphs.to_df(spark, graphs.grid2d(4, 3)[0])
    sopts = EngineOptions(rsb_max_iter=5, rsb_max_passes=1, rsb_tol=1e-4)
    for sname, sdf in (
        ("fiedler", fiedler(gdf, opts=sopts)),
        ("rsb", rsb_partition(gdf, 2, opts=sopts)),
    ):
        sp = sdf._jdf.queryExecution().executedPlan().toString()
        for line in sp.splitlines():
            if "row_number()" in line and "windowspecdefinition" in line:
                if not re.search(r"_pid#\d+", line):
                    failures.append(f"{sname}: whole-group window: {line.strip()[:140]}")
    spark.stop()
    print("AUDIT FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
