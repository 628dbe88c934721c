"""Training-data pipeline ops: dedup, similarity, text analysis, multimodal."""

import hashlib
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from parrsb_spark.operators.dedup import (
    embedding_neardup_lsh,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from parrsb_spark.operators.multimodal import (
    decode_image_meta,
    media_from_documents,
    sample_frames,
)
from parrsb_spark.operators.similarity import ann_lsh_topk, cosine_topk
from parrsb_spark.operators.textops import (
    fingerprint_bag,
    fingerprint_rolling,
    lang_id,
    quality_score,
    token_count,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "the quick brown fox jumps over the lazy dog", "en"),   # exact dup of 1
    (3, "the quick brown fox jumps over a lazy dog", "en"),     # near dup of 1
    (4, "der schnelle braune fuchs und der faule hund ist da", "de"),
    (5, "le renard brun rapide et le chien est la", "fr"),
    (6, "completely different content about spark engines", "en"),
    (7, "", "en"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t, l) for i, t, l in DOCS], schema="doc_id long, text string, lang string"
    ).cache()


def test_exact_dedup(spark, docs):
    rows = {r["doc_id"]: (r["canonical_id"], r["is_dup"]) for r in exact_dedup(docs).collect()}
    assert rows[1] == (1, False)
    assert rows[2] == (1, True)
    assert rows[3][1] is False


def test_token_count(spark, docs):
    got = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).collect()}
    assert got[1] == 9 and got[7] == 0


def test_lang_id(spark, docs):
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert got[1] == "en" and got[4] == "de" and got[5] == "fr"
    assert got[7] == "unknown"


def test_quality_score_deterministic(spark, docs):
    a = {r["doc_id"]: r["score"] for r in quality_score(docs).collect()}
    b = {r["doc_id"]: r["score"] for r in quality_score(docs.repartition(3)).collect()}
    assert a == b
    assert all(0.0 <= s <= 1.0 for s in a.values())


def test_fingerprints(spark, docs):
    bag = {r["doc_id"]: r["fp"] for r in fingerprint_bag(docs).collect()}
    roll = {r["doc_id"]: r["fp"] for r in fingerprint_rolling(docs).collect()}
    assert bag[1] == bag[2] and roll[1] == roll[2]        # dups agree
    assert bag[1] != bag[6] and roll[1] != roll[6]        # different docs differ
    # bag is order-insensitive, rolling is order-sensitive
    extra = spark.createDataFrame(
        [(100, "alpha beta"), (101, "beta alpha")], schema="doc_id long, text string"
    )
    bag2 = {r["doc_id"]: r["fp"] for r in fingerprint_bag(extra).collect()}
    roll2 = {r["doc_id"]: r["fp"] for r in fingerprint_rolling(extra).collect()}
    assert bag2[100] == bag2[101]
    assert roll2[100] != roll2[101]


def _py_shingles(text, n=3):
    return {text[i : i + n] for i in range(max(len(text) - n + 1, 0))}


def test_shingles_match_python(spark, docs):
    got = {}
    for r in shingles(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["sh"])
    for i, t, _ in DOCS:
        if t:
            assert got[i] == _py_shingles(t), i


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 6) not in pairs


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs
    assert (1, 6) not in pairs
    # signatures of identical docs are identical
    sig = minhash_signatures(docs).collect()
    s = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(16)) for r in sig}
    assert s[1] == s[2]


def test_simhash_close_for_near_dups(spark, docs):
    got = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert got[1] == got[2]
    ham13 = bin(got[1] ^ got[3]).count("1")
    ham16 = bin(got[1] ^ got[6]).count("1")
    assert ham13 < ham16


def _fake_embeddings(spark, n=40, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim))
    base[1] = base[0] + 0.01 * rng.normal(size=dim)  # near-dup pair (0,1)
    rows = [(i, [float(x) for x in base[i]], 0) for i in range(n)]
    return spark.createDataFrame(rows, schema="vec_id long, embedding array<double>, label int")


def test_embedding_neardup(spark):
    emb = _fake_embeddings(spark)
    pairs = {(r["a"], r["b"]) for r in embedding_neardup_pairs(emb, 0.99).collect()}
    assert (0, 1) in pairs


def test_embedding_neardup_lsh_matches_bruteforce(spark):
    """LSH bucket-join path == brute-force oracle (values AND pairs), and
    the plan contains no CartesianProduct/BroadcastNestedLoop node."""
    emb = _fake_embeddings(spark, n=80, dim=16, seed=7)
    for thresh in (0.99, 0.45):
        lsh = embedding_neardup_lsh(emb, thresh)
        got = sorted((r["a"], r["b"], r["cos"]) for r in lsh.collect())
        want = sorted(
            (r["a"], r["b"], r["cos"]) for r in embedding_neardup_pairs(emb, thresh).collect()
        )
        assert got == want, thresh
    plan = embedding_neardup_lsh(emb, 0.45)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_ngram_jaccard_stop_shingle_cap(spark):
    """A stop-shingle present in every doc must not fan out |D|² candidate
    rows: with the cap, the inverted-index join shrinks, and qualifying
    high-overlap pairs still surface."""
    stop = " the end marker xyz"  # > n chars shared by ALL docs
    rows = [(i, f"unique text body number {i} {i*7} {i*13}" + stop) for i in range(30)]
    rows[1] = (1, rows[0][1])  # exact dup of doc 0
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    capped = ngram_jaccard_pairs(docs, threshold=0.9, max_doc_frac=0.5, min_df_cap=1)
    uncapped = ngram_jaccard_pairs(docs, threshold=0.9, max_doc_frac=None)
    assert {(r["a"], r["b"]) for r in capped.collect()} == {(0, 1)}
    assert {(r["a"], r["b"]) for r in uncapped.collect()} == {(0, 1)}

    def n_join_rows(df, cap):
        sh = shingles(df)
        joinable = sh
        if cap is not None:
            dfreq = sh.groupBy("sh").agg(F.count("*").alias("_df"))
            joinable = sh.join(
                dfreq.filter(F.col("_df") <= int(cap * 30)).select("sh"), "sh"
            )
        a = joinable.select(F.col("doc_id").alias("a"), "sh")
        b = joinable.select(F.col("doc_id").alias("b"), "sh")
        return a.join(b, "sh").filter(F.col("a") < F.col("b")).count()

    assert n_join_rows(docs, 0.5) < n_join_rows(docs, None) / 2


def test_cosine_topk_exact(spark):
    emb = _fake_embeddings(spark)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("vec_id").alias("q_id"), "embedding")
    top = cosine_topk(emb, q, k=3).orderBy("rank").collect()
    assert top[0]["vec_id"] == 0 and abs(top[0]["cos"] - 1.0) < 1e-9
    assert top[1]["vec_id"] == 1  # the planted near-dup


def test_ann_lsh_recall(spark):
    emb = _fake_embeddings(spark, n=60)
    q = emb.limit(5).select(F.col("vec_id").alias("q_id"), "embedding")
    exact = cosine_topk(emb, q, k=1).collect()
    approx = {r["q_id"]: r["vec_id"] for r in ann_lsh_topk(emb, q, k=1, n_planes=6).collect()}
    # top-1 of each query is itself — always in its own bucket
    for r in exact:
        assert approx[r["q_id"]] == r["vec_id"]


def test_multimodal_plumbing(spark, docs):
    media = media_from_documents(docs.filter(F.col("text") != ""))
    imgs = decode_image_meta(media).collect()
    assert len(imgs) >= 1
    for r in imgs:
        assert r["sha1"] == hashlib.sha1(
            [t for i, t, _ in DOCS if i == r["media_id"]][0].encode()
        ).hexdigest()
        assert 16 <= r["width"] < 1040 and r["n_bytes"] > 0
    vids = media.filter(F.col("kind") == "video")
    if vids.count():
        frames = sample_frames(media, every_n_bytes=16).collect()
        assert len(frames) >= 1
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        decode_image_meta(media, decode="real").collect()
