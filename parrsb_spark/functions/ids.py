"""Dense global-id assignment (the gencon analogue).

The reference assigns dense, unique, 1-based global ids to fuzzy-matched
mesh vertices via segmented sort + prefix scan
(ref /root/reference/src/con-unique-vertices.c:378-443, src/con.c:108-136).
For a webgraph the match key is exact (canonicalized URL), so the Spark
form is distinct → rank.

Scale note: a global Window.orderBy would be a single-partition sort —
a scale-killer at 10^12 keys — so `dense_ids` is the distributed
per-partition count + prefix-offset form (the comm_scan analogue).
`dense_ids_window` keeps the naive single-partition form as a
cross-check oracle for tests only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_ids(keys: DataFrame, key_col: str = "url", out_col: str = "vid") -> DataFrame:
    """(key, vid) with vid dense, unique, 1-based, ordered by key.

    Deterministic (pure function of the key set) — the engine's analogue
    of the reference's 'dense unique IDs' API contract
    (/root/reference/README.md:55-58). Delegates to the scalable
    range-partitioned numbering; no single-partition exchange anywhere
    in the plan.
    """
    return dense_ids_scalable(keys, key_col=key_col, out_col=out_col)


def dense_ids_window(keys: DataFrame, key_col: str = "url", out_col: str = "vid") -> DataFrame:
    """Naive single-partition-window form. Test oracle ONLY — do not use
    in production paths (all rows funnel through one task)."""
    w = Window.orderBy(key_col)
    return keys.select(key_col).distinct().withColumn(out_col, F.row_number().over(w))


def grouped_rank(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    out_col: str = "rn",
    total_col: str | None = None,
) -> DataFrame:
    """Scale-safe per-group dense rank: 1..n_g within each group, ordered
    by `order_cols` (which MUST end in a unique tiebreaker, e.g. vid —
    range-partition boundaries between duplicate keys would otherwise
    make the rank nondeterministic).

    Replaces ``row_number().over(Window.partitionBy(group).orderBy(...))``
    whose ENTIRE group lands in one task — at RSB cut 0, group 0 is the
    whole graph, i.e. one executor sorting the planet. Here the rows are
    range-partitioned on (group, order...), ranked WITHIN each physical
    partition (bounded work per task), and per-(partition, group) prefix
    offsets — one tiny row per populated (partition, group), each group
    spanning only contiguous partitions — are broadcast back. Same
    mechanics as `dense_ids_scalable` (the comm_scan analogue); preserves
    every input column.

    `total_col`, if given, also attaches the group's TOTAL row count to
    every row — for free: the total rides the same tiny broadcast frame
    as the prefix offsets (per-(partition, group) rows, each group
    spanning ≤ #partitions of them), so no extra shuffle or join over
    the data. The walk kernel uses this for per-vertex degree.
    """
    ocols = list(order_cols)
    parted = df.repartitionByRange(F.col(group_col), *[F.col(c) for c in ocols])
    with_pid = parted.withColumn("_pid", F.spark_partition_id())
    w_in = Window.partitionBy("_pid", group_col).orderBy(*ocols)
    numbered = with_pid.withColumn("_local", F.row_number().over(w_in))
    # PIN the numbered table before deriving offsets: the final join
    # consumes `numbered` TWICE (rows + offsets), and repartitionByRange
    # samples its boundaries with an RDD-id-seeded RNG — when Catalyst's
    # exchange-reuse fails to dedup the two subtrees (observed under the
    # RSB driver: two materializations sampled different boundaries),
    # the sides disagree on `_pid` and the inner join SILENTLY DROPS
    # every row whose (_pid, group) moved — measured 463/100k vertices
    # lost at an RSB cut (tools/run_submit_smoke.sh, round 4). One eager
    # localCheckpoint makes both consumers read the same physical blocks:
    # row-preserving and bit-deterministic by construction.
    from parrsb_spark.session import hard_truncate

    # LAZY truncate: the offsets broadcast build below is the first
    # action and materializes the pinned blocks — same shared-RDD
    # determinism as the eager form, one fewer dedicated job per call
    numbered = hard_truncate(numbered, eager=False)
    counts = numbered.groupBy("_pid", group_col).agg(F.max("_local").alias("_cnt"))
    w_off = Window.partitionBy(group_col).orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)))
    side_cols = ["_pid", group_col, "_off"]
    if total_col is not None:
        w_tot = Window.partitionBy(group_col).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        offsets = offsets.withColumn(total_col, F.sum("_cnt").over(w_tot))
        side_cols.append(total_col)
    return (
        numbered.join(F.broadcast(offsets.select(*side_cols)), ["_pid", group_col])
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off")
    )


def dense_ids_scalable(
    keys: DataFrame,
    key_col: str | list[str] = "url",
    out_col: str = "vid",
) -> DataFrame:
    """Same contract, no single-partition sort: sort-partition the distinct
    keys by range, number within partitions, then add per-partition offsets
    (the comm_scan analogue, ref /root/reference/src/parrsb.c:108).
    `key_col` may be a list for lexicographic composite-key ordering.
    """
    key_cols = [key_col] if isinstance(key_col, str) else list(key_col)
    distinct = keys.select(*key_cols).distinct().repartitionByRange(*[F.col(c) for c in key_cols])
    with_part = distinct.withColumn("_pid", F.spark_partition_id())
    w_in = Window.partitionBy("_pid").orderBy(*key_cols)
    numbered = with_part.withColumn("_local", F.row_number().over(w_in))
    # same double-consumption hazard as grouped_rank (see comment there):
    # pin the sampled range partitioning before the offsets join
    from parrsb_spark.session import hard_truncate

    numbered = hard_truncate(numbered, eager=False)  # lazy — see grouped_rank
    # per-partition counts → prefix offsets (tiny: one row per partition)
    counts = numbered.groupBy("_pid").agg(F.max("_local").alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)))
    return (
        numbered.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
        .select(*key_cols, (F.col("_local") + F.col("_off")).alias(out_col))
    )
