"""Minimal repro: why does the per-iteration Lanczos plan recompile?

Replays two iterations of the loop's plan shape (localCheckpoint state
-> attach group scalars -> arithmetic select -> groupBy agg) with
DIFFERENT scalar values, captures debugCodegen() for both, and diffs.
Whatever text differs is what defeats the codegen cache.

Usage: python tools/codegen_diff_probe.py [literal|broadcast]
"""

from __future__ import annotations

import difflib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parrsb_spark.operators.fiedler import _attach_group_scalars
from parrsb_spark.session import get_spark


def codegen_text(df) -> str:
    qe = df._jdf.queryExecution()
    return qe.debug().codegenToSeq().mkString("\n=====\n") if hasattr(
        qe.debug(), "codegenToSeq") else ""


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "literal"
    thr = (1 << 30) if mode == "literal" else 0
    spark = get_spark(master="local[4]", app_name="codegen-diff",
                      shuffle_partitions=4)
    base = spark.range(0, 1000).select(
        F.col("id").alias("vid"), F.lit(0).alias("grp"),
        (F.rand(7) - 0.5).alias("u"), F.lit(0.0).alias("qprev"))
    state = base.localCheckpoint(eager=True)

    texts = []
    for itv, (a, b) in enumerate([(0.11, 0.22), (0.33, 0.44)]):
        st, sc = _attach_group_scalars(
            state, {"alpha": {0: a}, "beta": {0: b}}, threshold=thr)
        nxt = st.select(
            "vid", "grp",
            ((F.col("u") - sc["alpha"] * F.col("u")) / sc["beta"]
             - sc["beta"] * F.col("qprev")).alias("u"),
            (F.col("u") / sc["beta"]).alias("qprev"))
        agg = nxt.groupBy("grp").agg(F.sum(F.col("u") ** 2).alias("s1"),
                                     F.sum("u").alias("su"))
        texts.append(codegen_text(agg))
        agg.collect()
        state = nxt.localCheckpoint(eager=True)

    t0, t1 = texts
    if t0 == t1:
        print(f"[{mode}] generated code IDENTICAL across iterations")
        return
    # normalize obviously-irrelevant counters before diffing
    diff = list(difflib.unified_diff(t0.splitlines(), t1.splitlines(),
                                     lineterm="", n=1))
    print(f"[{mode}] generated code DIFFERS: {len(diff)} diff lines")
    for line in diff[:120]:
        print(line)
    spark.stop()


if __name__ == "__main__":
    main()
