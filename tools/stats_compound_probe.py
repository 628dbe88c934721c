"""Measure the origin-stats compounding pathology hard_truncate fixes.

`Dataset.checkpoint`/`localCheckpoint` preserve the pre-checkpoint
plan's ESTIMATED statistics on the resulting LogicalRDD, and
Catalyst's size-only stats visitor multiplies child sizes per join.
A driver loop whose round plan joins k >= 2 checkpointed state
branches therefore raises the carried sizeInBytes to the k-th power
every round — the BigInt's digit count grows geometrically, and past
~15 rounds the driver parks in BigInteger.multiply DURING PLANNING
(jstack: multiplyToomCook3 under SizeInBytesOnlyStatsPlanVisitor,
called from Dataset.localCheckpoint's explainString). Found live in
round 5 when the speculative-coloring loop (state cycles through
colored -> present -> tentative -> commit, three branches multiplying)
hard-hung at sf0.01 scale; `session.hard_truncate` (rebuild from the
checkpointed InternalRow RDD, dropping originStats) resets the base
each round.

This probe runs the SAME three-branch loop body both ways on the
sf0.001 co-purchase graph and prints per-round checkpoint walls plus
the digit count of the carried sizeInBytes: localCheckpoint walls grow
geometrically with digits doubling-plus per round; hard_truncate stays
flat. Usage: python tools/stats_compound_probe.py [rounds]
"""

import json
import sys
import time

# py4j ships the JVM BigInt as a decimal string and int()s it; past
# round ~8 the carried stat exceeds CPython's 4300-digit conversion
# guard and the READ itself raises ValueError — lift the cap so the
# probe can report the geometric arm instead of dying on it
sys.set_int_max_str_digits(2_000_000_000)

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from parrsb_spark.session import get_spark, hard_truncate


def loop(spark, edges, rounds, mode):
    """Three-branch state cycle: s' = ckpt(s ⋈ s ⋈ s-derived)."""
    ckpt = (
        hard_truncate
        if mode == "hard_truncate"
        else (lambda df: df.localCheckpoint(eager=True))
    )
    s = ckpt(edges.select(F.col("src").alias("vid")).distinct())
    walls, digits = [], []
    for _ in range(rounds):
        a = s.withColumnRenamed("vid", "a")
        b = s.withColumnRenamed("vid", "b")
        c = s.withColumnRenamed("vid", "c")
        nxt = (
            edges.join(a, edges.src == F.col("a"))
            .join(b, edges.dst == F.col("b"))
            .join(c, F.col("a") == F.col("c"))
            .select(F.col("a").alias("vid"))
            .distinct()
        )
        t0 = time.time()
        s = ckpt(nxt)
        walls.append(round(time.time() - t0, 2))
        # bit_length, not len(str()): past round ~8 the carried BigInt
        # exceeds CPython's 4300-digit int->str conversion limit — the
        # stringification itself raises ValueError, a second measured
        # face of the same compounding
        digits.append(
            int(
                s._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            ).bit_length()
        )
        if walls[-1] > 60:  # geometric arm: stop before the hard hang
            break
    return walls, digits


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    edges = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .selectExpr("l_orderkey", "l_partkey")
        .alias("a")
        .join(
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
            .selectExpr("l_orderkey", "l_partkey")
            .alias("b"),
            "l_orderkey",
        )
        .filter("a.l_partkey < b.l_partkey")
        .selectExpr("a.l_partkey AS src", "b.l_partkey AS dst")
        .distinct()
        .cache()
    )
    edges.count()
    out = {}
    for mode in ("hard_truncate", "localCheckpoint"):
        walls, digits = loop(spark, edges, rounds, mode)
        out[mode] = {"ckpt_walls_s": walls, "sizeinbytes_bits": digits}
        print(f"{mode}: walls={walls}", file=sys.stderr)
        print(f"{mode}: bits={digits}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"probe": "stats_compound", "rounds": rounds, **out}))


if __name__ == "__main__":
    main()
