"""Similarity search over an embedding column (array<float>).

Three paths:
- `cosine_topk`   brute-force exact top-k (the correctness baseline):
  broadcast the (small) query set against the corpus, dot products as
  JVM-side zip_with/aggregate expressions — no Python in the loop.
- `ann_lsh_topk`  random-hyperplane LSH: signature → bucket → exact
  rerank inside the bucket only. The 100 TB path: candidate generation
  is an equi-join on the bucket key instead of a cross join. Hyperplanes
  are seeded md5-arithmetic so signatures are reproducible anywhere.
  Recall knobs: `n_probes` (query-side bit flips, cheap) then
  `n_tables` (corpus re-hash, thorough) — cost A/B in BASELINE.md.
- `ivf_topk`      inverted-file ANN: driver-trained spherical k-means
  coarse quantizer → one nearest-centroid list per corpus vector →
  each query probes its `n_probe` nearest lists → exact rerank.
  Geometric recall control with directly budgeted candidate volume
  (≈ n_probe/n_lists of the corpus per query).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Two-phase distributed top-k: local top-k WITHIN each physical
    partition first (no shuffle — group = (partition, q_id), bounded by
    the partition size), then the global rank over the ≤ k·P survivors.
    A plain partitionBy(q_id) window would funnel one query's ENTIRE
    corpus scan through a single task. Same result, deterministic ties
    by vec_id."""
    wl = Window.partitionBy("_pid", "q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    pruned = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(wl))
        .filter(F.col("_lr") <= k)
        .drop("_pid", "_lr")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return pruned.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _norm(col: str):
    """ℓ2 norm FLOORED at 1e-150: a zero-norm embedding then scores
    cos = 0/1e-300 = 0 (no similarity) instead of 0/0 = NaN — and Spark
    treats NaN as LARGER than any double in both ordering and
    comparisons, so one zero vector in a 100 TB corpus would otherwise
    outrank every genuine match in every query's top-k. The floor is
    exact for any non-zero vector (the smallest representable non-zero
    norm is far above 1e-150) and its square, 1e-300, stays normal."""
    return F.greatest(
        F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x)), F.lit(1e-150)
    )


def _should_broadcast_queries(queries: DataFrame) -> bool:
    """Byte-estimated broadcast gate for an explicit query-side broadcast
    (which bypasses autoBroadcastJoinThreshold entirely). ONE tiny agg
    job: row count + max embedding width; estimated size = rows ×
    (dim × 8 + 48 struct overhead). Broadcast only while BOTH the row cap
    (`broadcast_threshold_rows`) and the byte cap
    (`broadcast_threshold_mb`) hold — a 1M-row set of 1024-dim doubles
    is ~8 GB and would OOM every executor even though the row cap alone
    admits it."""
    from parrsb_spark.config import default_options

    opts = default_options()
    r = queries.agg(
        F.count(F.lit(1)).alias("n"), F.max(F.size("embedding")).alias("d")
    ).collect()[0]
    n, d = int(r["n"] or 0), int(r["d"] or 0)
    est_bytes = n * (d * 8 + 48)
    return n <= opts.broadcast_threshold_rows and est_bytes <= opts.broadcast_threshold_mb * (
        1 << 20
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """(q_id, vec_id, cos, rank) — exact top-k by cosine per query.

    corpus = (vec_id, embedding), queries = (q_id, embedding). Ties break
    on vec_id for full determinism.

    The query side is broadcast ONLY while it fits
    (`EngineOptions.broadcast_threshold_rows` AND the byte estimate of
    `broadcast_threshold_mb` — see `_should_broadcast_queries`): a
    broadcast of an oversized query set would OOM every executor, so
    past either threshold the plan falls back to a partitioned
    cartesian (each task scores a corpus-slice × query-slice block).
    Pass `broadcast_queries` explicitly to skip the gating agg job."""
    if broadcast_queries is None:
        broadcast_queries = _should_broadcast_queries(queries)
    c = corpus.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nv", _norm("v"))
    q = queries.select(
        "q_id", F.col("embedding").cast("array<double>").alias("qv")
    ).withColumn("nq", _norm("qv"))
    scored = (
        c.crossJoin(F.broadcast(q) if broadcast_queries else q)
        .withColumn("cos", _dot("v", "qv") / (F.col("nv") * F.col("nq")))
        .select("q_id", "vec_id", F.round("cos", 9).alias("cos"))
    )
    return _topk_per_query(scored, k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from md5(seed, plane, dim)."""
    out = np.empty((n_planes, dim))
    for p in range(n_planes):
        for d in range(dim):
            h = int.from_bytes(hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[:8], "big")
            out[p, d] = (h / 2**64) * 2.0 - 1.0
    return out


def signbit_signatures(
    vecs: DataFrame,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """(id, sig) — packed sign-pattern (bit p = 1 iff v·plane_p > 0) from
    deterministic random hyperplanes. Vectorized pandas UDF: one matmul
    per Arrow batch. Pass `dim` when known to skip the one-row probe job."""
    spark = vecs.sparkSession
    if dim is None:
        dim = len(vecs.select("embedding").first()["embedding"])
    planes = _hyperplanes(dim, n_planes, seed)
    bplanes = spark.sparkContext.broadcast(planes)

    @F.pandas_udf("long")
    def sig_udf(emb: pd.Series) -> pd.Series:
        M = np.stack(emb.to_numpy())  # (batch, dim)
        signs = (M @ bplanes.value.T) > 0  # (batch, planes)
        weights = 1 << np.arange(signs.shape[1], dtype=np.int64)
        return pd.Series(signs @ weights)

    return vecs.select(F.col(id_col).alias("id"), sig_udf("embedding").alias("sig"))


def lsh_signatures(
    vecs: DataFrame,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """(id, bucket) — single-table bucket id = the packed sign pattern.
    Pass `dim` when known to skip the one-row probe job."""
    return signbit_signatures(vecs, n_planes, seed, id_col, dim=dim).withColumnRenamed(
        "sig", "bucket"
    )


def probe_buckets(
    vecs: DataFrame,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "q_id",
    n_probes: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """(id, bucket) with up to `n_probes` rows per vector — multi-probe
    query buckets: the base sign-pattern bucket plus the buckets reached
    by flipping the lowest-|margin| sign bits, one at a time, in margin
    order (the classic multi-probe heuristic: a plane whose projection
    is nearly zero is the one most likely to disagree between a query
    and its true neighbors). Flipping only the QUERY side keeps the
    corpus index at one row per vector — probing multiplies the small
    side of the bucket join, never the 100 TB side. Same vectorized
    pandas UDF shape as `signbit_signatures` (one matmul + one argsort
    per Arrow batch)."""
    spark = vecs.sparkSession
    if n_probes < 1:
        raise ValueError("n_probes must be >= 1")
    if n_probes > n_planes + 1:
        raise ValueError("n_probes can flip each plane at most once: need n_probes <= n_planes + 1")
    if dim is None:
        dim = len(vecs.select("embedding").first()["embedding"])
    planes = _hyperplanes(dim, n_planes, seed)
    bplanes = spark.sparkContext.broadcast(planes)
    n_extra = n_probes - 1

    @F.pandas_udf("array<long>")
    def probes_udf(emb: pd.Series) -> pd.Series:
        M = np.stack(emb.to_numpy())  # (batch, dim)
        proj = M @ bplanes.value.T  # (batch, planes)
        weights = 1 << np.arange(proj.shape[1], dtype=np.int64)
        base = ((proj > 0) @ weights).astype(np.int64)  # (batch,)
        if n_extra == 0:
            return pd.Series([[b] for b in base])
        # planes ranked by |margin| ascending; flip one per extra probe
        order = np.argsort(np.abs(proj), axis=1)[:, :n_extra]  # (batch, n_extra)
        flips = base[:, None] ^ (np.int64(1) << order.astype(np.int64))
        return pd.Series([[b, *f] for b, f in zip(base, flips)])

    return vecs.select(
        F.col(id_col).alias("id"),
        F.explode(probes_udf("embedding")).alias("bucket"),
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    broadcast_queries: bool | None = None,
    n_tables: int = 1,
    n_probes: int = 1,
) -> DataFrame:
    """(q_id, vec_id, cos, rank) — approximate top-k: only corpus vectors
    sharing an LSH bucket with the query (in ANY of `n_tables` independent
    hash tables, under ANY of the query's `n_probes` probe buckets) are
    scored. Recall < 1 by design; the three knobs:
    - fewer `n_planes` → bigger buckets → higher recall, more rerank work;
    - more `n_tables` → a vector only needs to collide in ONE table, so
      recall ≈ 1 − (1 − p^planes)^tables rises with tables at constant
      per-bucket cost — but each table re-hashes the CORPUS side;
    - more `n_probes` → each query also looks in the buckets reached by
      flipping its lowest-|margin| sign bits (`probe_buckets`) — the
      recall lever that multiplies only the QUERY side of the join,
      leaving the corpus index untouched (the right knob when the corpus
      is the 100 TB side and re-hashing it per table is the cost).
    Tables use derived seeds (seed, seed+1, …); the candidate union is
    deduped on (q_id, vec_id) BEFORE the exact rerank so a pair colliding
    in several tables/probes is scored once.

    The query-side broadcast is gated exactly like `cosine_topk`
    (`_should_broadcast_queries`); past the threshold the candidate join
    stays a plain shuffle equi-join on the bucket key — it is already
    keyed, so the fallback shuffles instead of OOMing (no crossJoin
    risk either way)."""
    if n_tables < 1:
        raise ValueError("n_tables must be >= 1")
    if n_probes < 1:
        raise ValueError("n_probes must be >= 1")
    if broadcast_queries is None:
        broadcast_queries = _should_broadcast_queries(queries)
    c = corpus.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nv", _norm("v"))
    q = queries.select(
        "q_id", F.col("embedding").cast("array<double>").alias("qv")
    ).withColumn("nq", _norm("qv"))
    # dim probed ONCE (queries are the small side; corpus dim matches by
    # contract) and threaded through every signature call — without it
    # each of the n_tables corpus/query hashings would re-run its own
    # one-row .first() probe job
    dim = len(queries.select("embedding").first()["embedding"])
    if n_tables == 1 and n_probes == 1:
        sig_c = lsh_signatures(corpus, n_planes, seed, dim=dim).withColumnRenamed(
            "id", "vec_id"
        )
        sig_q = lsh_signatures(
            queries, n_planes, seed, id_col="q_id", dim=dim
        ).withColumnRenamed("id", "q_id")
        cb = c.join(sig_c, "vec_id")
        qb = q.join(sig_q, "q_id")
        scored = (
            cb.join(F.broadcast(qb) if broadcast_queries else qb, "bucket")
            .withColumn("cos", _dot("v", "qv") / (F.col("nv") * F.col("nq")))
            .select("q_id", "vec_id", F.round("cos", 9).alias("cos"))
        )
        return _topk_per_query(scored, k)
    # multi-table / multi-probe: candidate (q_id, vec_id) pairs per table,
    # union, dedup, then ONE exact rerank over the deduped set. The
    # per-table join moves only (id, bucket) pairs — the embeddings join
    # in once, post-dedup. The corpus side always carries ONE bucket per
    # vector; only the query side fans out n_probes-fold.
    cands = None
    for t in range(n_tables):
        sig_c = lsh_signatures(corpus, n_planes, seed + t, dim=dim).withColumnRenamed(
            "id", "vec_id"
        )
        sig_q = probe_buckets(
            queries, n_planes, seed + t, id_col="q_id", n_probes=n_probes, dim=dim
        ).withColumnRenamed("id", "q_id")
        pairs = sig_c.join(
            F.broadcast(sig_q) if broadcast_queries else sig_q, "bucket"
        ).select("q_id", "vec_id")
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.distinct()
    scored = (
        cands.join(c, "vec_id")
        .join(F.broadcast(q) if broadcast_queries else q, "q_id")
        .withColumn("cos", _dot("v", "qv") / (F.col("nv") * F.col("nq")))
        .select("q_id", "vec_id", F.round("cos", 9).alias("cos"))
    )
    return _topk_per_query(scored, k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path, complementing LSH


def ivf_train_centroids(
    corpus: DataFrame,
    n_lists: int = 64,
    seed: int = 42,
    sample_per_list: int = 64,
    kmeans_iters: int = 8,
) -> np.ndarray:
    """(n_lists, dim) spherical k-means centroids, trained on a bounded
    DETERMINISTIC sample of the corpus — the coarse quantizer is a
    driver-side artifact (like the reference's per-level setup tables),
    the corpus itself is never collected. Sampling keys on
    md5-arithmetic of vec_id (`functions.hashing` convention: portable,
    order-independent, re-runs identically on any partitioning), capped
    at `sample_per_list × n_lists` rows. Lloyd iterations run on the
    L2-normalized sample with argmax-cosine assignment; empty lists
    re-seed from the farthest sample point, so every list is populated."""
    from parrsb_spark.functions.hashing import md5_long_col

    cap = int(n_lists) * int(sample_per_list)
    key = md5_long_col(F.concat(F.lit(f"ivf:{seed}:"), F.col("vec_id").cast("string")))
    hashed = corpus.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), key.alias("_h")
    )
    # a bare orderBy(limit cap).collect() ships each partition's LOCAL
    # top-cap to the driver — ~cap × n_partitions rows, which breaks
    # spark.driver.maxResultSize on a large corpus. Pre-filter to the
    # hash range expected to hold 3×cap rows (60-bit uniform hash, so a
    # 3× oversample practically never undershoots), THEN take the global
    # smallest cap: the collect is bounded by ~3×cap rows regardless of
    # corpus size, and the selected set is the same deterministic
    # "cap smallest hashes" whatever the partitioning.
    n_total = corpus.count()
    if n_total > 3 * cap:
        hashed = hashed.filter(F.col("_h") < int((3 * cap / n_total) * (1 << 60)))
    sample = hashed.orderBy("_h").limit(cap).collect()
    if len(sample) < min(cap, n_total):  # astronomically unlikely undershoot
        sample = (
            corpus.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
            .withColumn("_h", key)
            .orderBy("_h")
            .limit(cap)
            .collect()
        )
    X = np.stack([np.asarray(r["v"], dtype=np.float64) for r in sample])
    # zero-norm guard (same as ivf_assign's): one all-zero embedding in
    # the sample must not NaN-poison every centroid through the matmul
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)]
    if len(cents) < n_lists:  # tiny corpus: pad by jittering existing picks
        pad = cents[rng.integers(0, len(cents), size=n_lists - len(cents))]
        cents = np.concatenate([cents, pad + 1e-6 * rng.normal(size=pad.shape)])
    for _ in range(kmeans_iters):
        sims = X @ cents.T  # (n, lists) cosine on normalized rows
        assign = np.argmax(sims, axis=1)
        # re-seed order for empty lists: worst-covered sample points,
        # one DISTINCT point per empty list — a single shared pick would
        # leave exact-duplicate centroids, and first-max assignment can
        # never separate duplicates again (the lowest-id twin absorbs
        # every member; the others stay empty forever)
        far_order = np.argsort(np.max(sims, axis=1))
        nf = 0
        for li in range(n_lists):
            members = X[assign == li]
            if len(members):
                m = members.mean(axis=0)
                cents[li] = m / max(np.linalg.norm(m), 1e-12)
            else:
                cents[li] = X[far_order[nf % len(X)]]
                nf += 1
    return cents


def ivf_assign(
    vecs: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    n_probe: int = 1,
) -> DataFrame:
    """(id, list_id) — nearest `n_probe` centroid lists per vector by
    cosine, vectorized (one matmul + one argpartition per Arrow batch).
    n_probe=1 builds the corpus index (each vector in exactly ONE list);
    n_probe>1 is the query side's recall knob — like LSH's multi-probe,
    it fans out only the small side of the list join."""
    spark = vecs.sparkSession
    if n_probe < 1:
        raise ValueError("n_probe must be >= 1")
    if n_probe > len(centroids):
        raise ValueError("n_probe cannot exceed n_lists")
    C = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(C)
    npb = int(n_probe)

    @F.pandas_udf("array<long>")
    def lists_udf(emb: pd.Series) -> pd.Series:
        M = np.stack(emb.to_numpy()).astype(np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = M @ bc.value.T  # (batch, lists)
        if npb == 1:
            # ties broken by lowest list id (argmax is first-max): the
            # SAME vector always lands in the SAME list
            return pd.Series([[int(i)] for i in np.argmax(sims, axis=1)])
        # full stable sort (sim desc, list id asc) — NOT argpartition:
        # argpartition's boundary-tie selection is arbitrary, so under
        # exact centroid ties it can EXCLUDE the first-occurrence max —
        # the very list np.argmax indexed the corpus side into — and
        # silently break the rank-1 self-match contract. lexsort keeps
        # sel[0] == argmax unconditionally, at O(L log L) per row over
        # the small centroid count.
        ids = np.arange(sims.shape[1])
        rows = []
        for r in range(len(sims)):
            sel = np.lexsort((ids, -sims[r]))[:npb]
            rows.append([int(i) for i in sel])
        return pd.Series(rows)

    return vecs.select(
        F.col(id_col).alias("id"),
        F.explode(lists_udf("embedding")).alias("list_id"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 64,
    n_probe: int = 4,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """(q_id, vec_id, cos, rank) — IVF approximate top-k: train (or
    reuse) a coarse quantizer, index each corpus vector into its ONE
    nearest-centroid list, probe each query's `n_probe` nearest lists,
    exact-rerank the union. The complementary scale path to
    `ann_lsh_topk`: recall is controlled geometrically (probe more
    lists) instead of probabilistically (more planes/tables/probes),
    and candidate volume is directly budgeted at ≈ n_probe/n_lists of
    the corpus per query. A query identical to a corpus vector probes
    its own list first, so the rank-1 self-match contract holds at any
    n_probe ≥ 1. Pass a pre-trained `centroids` to amortize training
    across query batches (the 100 TB usage: train once, reuse)."""
    if centroids is None:
        centroids = ivf_train_centroids(corpus, n_lists=n_lists, seed=seed)
    if broadcast_queries is None:
        broadcast_queries = _should_broadcast_queries(queries)
    c = corpus.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nv", _norm("v"))
    q = queries.select(
        "q_id", F.col("embedding").cast("array<double>").alias("qv")
    ).withColumn("nq", _norm("qv"))
    idx_c = ivf_assign(corpus, centroids, id_col="vec_id").withColumnRenamed("id", "vec_id")
    idx_q = ivf_assign(queries, centroids, id_col="q_id", n_probe=n_probe).withColumnRenamed(
        "id", "q_id"
    )
    # lists are disjoint on the corpus side, so (q_id, vec_id) pairs are
    # already unique — no dedup needed before the rerank
    pairs = idx_c.join(
        F.broadcast(idx_q) if broadcast_queries else idx_q, "list_id"
    ).select("q_id", "vec_id")
    scored = (
        pairs.join(c, "vec_id")
        .join(F.broadcast(q) if broadcast_queries else q, "q_id")
        .withColumn("cos", _dot("v", "qv") / (F.col("nv") * F.col("nq")))
        .select("q_id", "vec_id", F.round("cos", 9).alias("cos"))
    )
    return _topk_per_query(scored, k)
