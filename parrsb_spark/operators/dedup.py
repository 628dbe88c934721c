"""Deduplication suite for web-scale training-data pipelines.

Five dedup modalities, each with a distinct cost/recall point:
- exact            hash-groupBy on md5(text)           (0 false positives)
- ngram_jaccard    character-shingle set similarity     (exact Jaccard)
- minhash_lsh      shingle → K minhashes → banded LSH   (sub-quadratic)
- simhash          weighted bit-vote signature          (constant per doc)
- embedding near-dup  cosine over the embeddings table  (semantic)

Everything is md5-keyed arithmetic (functions/hashing.py) so the DuckDB
oracle reproduces every signature bit-exactly. Scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parrsb_spark.functions.hashing import MOD_P, MOD_X, HASH_SALT_A, HASH_SALT_B, md5_long_col
from parrsb_spark.operators.textops import tokens_col

NGRAM = 3
MINHASH_K = 16
LSH_BANDS = 4  # 4 bands × 4 rows


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, canonical_id, is_dup) — canonical = min doc_id per md5(text).
    One shuffle (groupBy the digest); at 100 TB this is the cheapest pass
    and always runs first to shrink the candidate set for the fuzzy passes."""
    keyed = docs.select("doc_id", F.md5("text").alias("digest"))
    canon = keyed.groupBy("digest").agg(F.min("doc_id").alias("canonical_id"))
    return (
        keyed.join(canon, "digest")
        .select("doc_id", "canonical_id", (F.col("doc_id") != F.col("canonical_id")).alias("is_dup"))
    )


def shingle_arrays(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """(doc_id, shs) — each doc's DISTINCT character n-grams as ONE array
    column. The distinct is `array_distinct` WITHIN the row (all of a
    doc's shingles live in its own text cell), so the shingle set costs
    ZERO shuffles — round 5 paid a full exchange of the exploded
    (doc_id, sh) stream for the same set (guide §2.4: a `distinct` on
    data whose duplicates never cross rows needs no exchange)."""
    # guard: Spark's sequence(1, 0) counts DOWN ([1, 0]); emit an empty
    # array for texts shorter than n instead
    idxs = F.when(
        F.length("text") >= n, F.sequence(F.lit(1), F.length("text") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(idxs, lambda i: F.col("text").substr(i, F.lit(n)))
        ).alias("shs"),
    )


def shingles(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """(doc_id, sh) — distinct character n-grams (JVM-side sequence+substring,
    no Python). Exploded view of `shingle_arrays` — per-row distinct,
    no exchange in the plan."""
    return shingle_arrays(docs, n).select("doc_id", F.explode("shs").alias("sh"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = NGRAM,
    max_doc_frac: float | None = 0.97,
    min_df_cap: int = 100,
) -> DataFrame:
    """(a, b, jaccard) — doc pairs with shingle-set Jaccard ≥ threshold, a < b.

    Plan: shingle explode → self-join on shingle (the inverted index) →
    common counts → sizes → |A∩B| / (|A|+|B|−|A∩B|). The self-join is the
    scale hazard: hot shingles fan out quadratically, so the inverted
    index drops shingles whose document frequency exceeds
    `max_doc_frac · |D|` (stop-shingle pruning) before the join. A
    stop-shingle in every doc would otherwise emit |D|² candidate rows.

    Jaccard is computed consistently over the CAPPED shingle sets (sizes
    and intersections both exclude pruned shingles) — i.e. similarity
    over *informative* shingles, the standard stopword-removal semantics.
    Exact duplicates therefore always score 1.0 regardless of the cap;
    only near-universal (≤ (1−max_doc_frac) discriminative) content is
    ignored. `max_doc_frac=None` disables the cap (raw exact semantics,
    matches the uncapped SQL oracle bit-for-bit).

    The cap is floored at `min_df_cap`: on a tiny corpus,
    int(0.97·|D|) < |D| would prune even shingles shared by EVERY doc —
    a 2-doc corpus of exact duplicates would lose all its shingles and
    never emit the pair. Below the floor the cap cannot bite, which is
    the correct small-corpus behavior; at web scale the floor is
    irrelevant (the cap is millions)."""
    sh = shingles(docs, n).cache()
    if max_doc_frac is not None:
        cap = max(int(max_doc_frac * docs.count()), min_df_cap)
        dfreq = sh.groupBy("sh").agg(F.count("*").alias("_df"))
        sh = sh.join(dfreq.filter(F.col("_df") <= cap).select("sh"), "sh")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("a"), "sh")
    b = sh.select(F.col("doc_id").alias("b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn("jaccard", F.col("common") / (F.col("sza") + F.col("szb") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def minhash_signatures(
    docs: DataFrame, k: int = MINHASH_K, n: int = NGRAM, shingles_df: DataFrame | None = None
) -> DataFrame:
    """(doc_id, h0..h{k-1}) — K universal-hash minima over the shingle set.

    ZERO-shuffle form: a doc's shingles live in one array cell
    (`shingle_arrays`), so every minimum is `array_min` over a
    `transform` — pure whole-stage codegen, no explode, no exchange
    anywhere in the signature plan (round 5 paid the shingle-distinct
    exchange plus a K-column hash aggregate for the same values; the
    docs with an empty shingle set are absent either way — the groupBy
    had no rows for them, the array path filters size = 0).

    Pass `shingles_df` (an exploded, cached (doc_id, sh) set) to share
    a scan with a caller that needs the exploded view — that path keeps
    the groupBy shape."""
    if shingles_df is not None:
        th = (md5_long_col(F.col("sh")) % MOD_X).alias("th")
        base = shingles_df.select("doc_id", th)
        aggs = [
            F.min((F.col("th") * HASH_SALT_A[i] + HASH_SALT_B[i]) % MOD_P).alias(f"h{i}")
            for i in range(k)
        ]
        return base.groupBy("doc_id").agg(*aggs)
    return _signatures_from_arrays(shingle_arrays(docs, n), k)


def _signatures_from_arrays(sharr: DataFrame, k: int) -> DataFrame:
    """(doc_id, h0..h{k-1}) from (doc_id, shs) — the JVM-only min pass."""
    ths = F.transform("shs", lambda s: md5_long_col(s) % MOD_X)
    sig_cols = [
        F.array_min(
            F.transform("_ths", lambda t: (t * HASH_SALT_A[i] + HASH_SALT_B[i]) % MOD_P)
        ).alias(f"h{i}")
        for i in range(k)
    ]
    return (
        sharr.where(F.size("shs") > 0)
        .withColumn("_ths", ths)
        .select("doc_id", *sig_cols)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = NGRAM,
) -> DataFrame:
    """(a, b, jaccard) near-dup pairs via banded MinHash-LSH, verified with
    the exact shingle Jaccard. Sub-quadratic: candidates only form inside
    an LSH bucket (band collision), THEN the exact verify join runs on the
    (tiny) candidate set — the 100 TB-safe plan shape.

    Skew note: a hot bucket (m near-identical docs share a band hash)
    expands to m² candidate rows in the self-join; both join sides are
    sort-merge-joined on the band key, so AQE's both-side skew split
    (enabled in session.py) decomposes a hot bucket into sub-partition
    pairs — the same block decomposition checks.mirror_pairs builds
    explicitly. The m² pairs themselves are the intended output of a
    near-dup cluster, not waste."""
    # Dedup-corpus structure is the whole point of this kernel: a
    # near-dup-heavy corpus has MANY docs with the IDENTICAL shingle
    # set (exact re-uploads, boilerplate). Signatures, band keys,
    # bucket collisions and the exact Jaccard are all pure functions of
    # the shingle SET, so the entire pipeline runs at the level of
    # DISTINCT sets (keyed by a digest of the sorted set), and doc
    # pairs are expanded back ONLY at the very end. A duplicate cluster
    # of m docs costs m² rows once at output (those rows ARE the
    # output) instead of bands·m² rows through the bucket join plus m²
    # array intersections through the verify (guide §2.3: shuffle keys
    # and metadata, move the heavy work once). Shapes on top of that:
    # per-row array_distinct shingle sets (no distinct exchange),
    # array_min signatures (no aggregate), in-row array_intersect
    # verify on candidate set pairs only (round 5 ran an inverted-index
    # join over the full exploded shingle stream).
    # set digest: shingles are fixed-length (n chars), so the plain
    # concat of the sorted set is prefix-unambiguous. ONE cached table
    # carries (doc_id, dg, shs) — the digest map, the representative
    # arrays and the signature pass all read it without recomputing the
    # shingle transform.
    sharr = (
        shingle_arrays(docs, n)
        .where(F.size("shs") > 0)
        .withColumn("dg", F.md5(F.concat_ws("", F.array_sort("shs"))))
        .cache()
    )
    dmap = sharr.select("doc_id", "dg")
    # one representative array per distinct set (min doc_id — arrays
    # are identical within a digest, the choice is cosmetic)
    rep_arr = (
        sharr.groupBy("dg")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(sharr.select("doc_id", "shs"), "doc_id")
        .select("dg", "shs")
        .cache()
    )
    rows_per_band = k // bands
    sig = _signatures_from_arrays(rep_arr.withColumnRenamed("dg", "doc_id"), k)
    band_structs = []
    for bnd in range(bands):
        cols = [F.col(f"h{bnd * rows_per_band + r}") for r in range(rows_per_band)]
        bh = F.md5(F.concat_ws("_", F.lit(bnd), *[c.cast("string") for c in cols]))
        band_structs.append(F.struct(F.lit(bnd).alias("bnd"), bh.alias("bh")))
    banded = (
        sig.select(F.col("doc_id").alias("dg"), F.explode(F.array(*band_structs)).alias("b"))
        .select("dg", F.col("b.bnd").alias("bnd"), F.col("b.bh").alias("bh"))
        .cache()
    )
    # digest-level candidates; d1 == d2 (two docs of one duplicate
    # cluster) is a REAL candidate pair class and always verifies at
    # jaccard 1.0
    cand = (
        banded.select(F.col("dg").alias("d1"), "bnd", "bh")
        .join(banded.select(F.col("dg").alias("d2"), "bnd", "bh"), ["bnd", "bh"])
        .filter(F.col("d1") <= F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    verified = (
        cand.join(rep_arr.select(F.col("dg").alias("d1"), F.col("shs").alias("_sha")), "d1")
        .join(rep_arr.select(F.col("dg").alias("d2"), F.col("shs").alias("_shb")), "d2")
        .select(
            "d1",
            "d2",
            F.size(F.array_intersect("_sha", "_shb")).alias("common"),
            F.size("_sha").alias("sza"),
            F.size("_shb").alias("szb"),
        )
        .filter(F.col("common") > 0)  # inner-join parity of the round-5
        # inverted index: a candidate pair sharing no shingle never
        # appeared there either (matters only at threshold ≤ 0)
        .withColumn(
            "jaccard", F.col("common") / (F.col("sza") + F.col("szb") - F.col("common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", F.round("jaccard", 6).alias("jaccard"))
    )
    # expand back to doc pairs: a doc pair maps to exactly ONE
    # (normalized) digest pair, so the expansion introduces no dups
    return (
        verified.join(dmap.select(F.col("dg").alias("d1"), F.col("doc_id").alias("_x")), "d1")
        .join(dmap.select(F.col("dg").alias("d2"), F.col("doc_id").alias("_y")), "d2")
        # same-digest pairs arise once per ordering of (_x, _y): keep one;
        # cross-digest pairs arise exactly once already
        .filter((F.col("d1") != F.col("d2")) | (F.col("_x") < F.col("_y")))
        .select(
            F.least("_x", "_y").alias("a"),
            F.greatest("_x", "_y").alias("b"),
            "jaccard",
        )
    )


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash) — weighted bit-vote signature over token hashes.

    explode(tokens) × explode(bit index) → Σ ±count votes per bit →
    pack. All JVM-side; the bit explode is a 32× row amplification of the
    token stream, still linear."""
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("word"))
    wcnt = toks.groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))
    h = md5_long_col(F.col("word"))
    hashed = wcnt.select("doc_id", h.alias("th"), "cnt")
    bits_df = hashed.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "th",
        "cnt",
    )
    votes = bits_df.withColumn(
        "vote",
        F.when(F.expr("(th >> bit) & 1") == 1, F.col("cnt")).otherwise(-F.col("cnt")),
    )
    per_bit = votes.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    packed = per_bit.withColumn(
        "bitval", F.when(F.col("v") > 0, F.expr("CAST(1 AS BIGINT) << bit")).otherwise(F.lit(0))
    )
    return packed.groupBy("doc_id").agg(F.sum("bitval").alias("simhash"))


def embedding_neardup_pairs(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """(a, b, cos) — embedding pairs with cosine ≥ threshold, a < b.
    Brute-force O(n²) self-join. CORRECTNESS BASELINE / TEST ORACLE ONLY —
    production and the contract query use `embedding_neardup_lsh` (banded
    hyperplane LSH bucket join → exact cosine verify, no crossJoin)."""
    e = embeddings.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v")
    )
    nrm = e.select(
        "vec_id",
        "v",
        # floored like similarity._norm: a zero vector must score cos=0,
        # not 0/0=NaN (NaN compares LARGER than any double in Spark, so
        # it would pass the >= threshold filter)
        F.greatest(
            F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)), F.lit(1e-150)
        ).alias("nrm"),
    )
    a = nrm.select(F.col("vec_id").alias("a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = nrm.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 6).alias("cos"))
    )


def embedding_neardup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    planes_per_band: int | None = None,
    bands: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """(a, b, cos) — near-dup pairs via banded random-hyperplane LSH, then
    EXACT cosine verify on candidates only. Same plan shape as
    `minhash_lsh_pairs`: signature → band explode → equi-join on the band
    key → verify. No crossJoin anywhere in the plan.

    Recall math (sign-LSH): a pair at cosine c agrees on one hyperplane
    with prob s = 1 − arccos(c)/π; it collides in a band of r planes with
    prob s^r, and is MISSED entirely with prob (1 − s^r)^B over B bands.
    Exact verify removes all false positives, so miss-prob is the only
    error. Parameter presets by threshold:
      τ ≥ 0.9 (production near-dup): s ≥ 0.856 → r=8, B=8 (64 planes,
        256-way buckets/band, miss < 1e-3, strong pruning).
      τ ≈ 0.45 (loose semantic pairs): s ≈ 0.65 → r=2, B=32 (64 planes,
        miss ≈ 3e-8/pair at the threshold, falling superexponentially
        above it — chosen so the exact-SQL oracle comparison at the
        correctness gate has negligible miss probability even over
        millions of near-threshold pairs; the gate's residual
        probabilistic nature is documented at the contract query).
        NOTE: at loose thresholds the band key is only
        r bits wide, so bucket pruning is weak — sign-LSH fundamentally
        cannot prune pairs near cos 0; the verify join still bounds work
        to colliding pairs and the plan stays a keyed equi-join (skew
        handled by AQE), not a crossJoin.
    """
    if planes_per_band is None or bands is None:
        if threshold >= 0.85:
            planes_per_band, bands = 8, 8
        elif threshold >= 0.65:
            planes_per_band, bands = 4, 16
        else:
            planes_per_band, bands = 2, 32
    from parrsb_spark.operators.similarity import signbit_signatures

    n_planes = planes_per_band * bands
    sig = signbit_signatures(embeddings, n_planes=n_planes, seed=seed)
    mask = (1 << planes_per_band) - 1
    band_structs = [
        F.struct(
            F.lit(bnd).alias("bnd"),
            F.shiftright("sig", bnd * planes_per_band).bitwiseAND(F.lit(mask)).alias("bh"),
        )
        for bnd in range(bands)
    ]
    banded = sig.select("id", F.explode(F.array(*band_structs)).alias("b")).select(
        F.col("id"), F.col("b.bnd").alias("bnd"), F.col("b.bh").alias("bh")
    )
    cand = (
        banded.select(F.col("id").alias("a"), "bnd", "bh")
        .join(banded.select(F.col("id").alias("b"), "bnd", "bh"), ["bnd", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    nrm = embeddings.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn(
        "nrm",
        # same zero-norm floor as the brute-force twin (cos=0, never NaN)
        F.greatest(
            F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)),
            F.lit(1e-150),
        ),
    )
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        cand.join(nrm.select(F.col("vec_id").alias("a"), F.col("v").alias("va"), F.col("nrm").alias("na")), "a")
        .join(nrm.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")), "b")
        .withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 6).alias("cos"))
    )
