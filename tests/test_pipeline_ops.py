"""Training-data pipeline operators: dedup, similarity, text stats,
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from invoice_anomaly_detection_sieve_spark.operators import (
    dedup,
    multimodal,
    similarity,
    textstats,
)


@pytest.fixture(scope="module")
def textdocs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
        (4, "completely different content about spark dataframes and shuffle exchanges"),
        (5, "der hund und die katze sind nicht mit der maus in das haus"),
        (6, "le chat est dans la maison et le chien est pour la vie"),
        (7, ""),
        (8, "zzz qqq xxx"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates(textdocs):
    out = {r["doc_id"]: r.asDict() for r in dedup.exact_duplicates(textdocs).collect()}
    assert out[1]["dup_count"] == 2 and out[2]["dup_count"] == 2
    assert out[1]["is_kept"] is True and out[2]["is_kept"] is False
    assert out[3]["dup_count"] == 1


def test_minhash_lsh_finds_near_dup(textdocs):
    pairs = {(r["a_id"], r["b_id"]) for r in dedup.minhash_lsh_pairs(textdocs).collect()}
    assert (1, 2) in pairs  # identical docs always collide
    # near-dup should collide in at least one band with high probability
    assert (1, 3) in pairs or (2, 3) in pairs
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_near_duplicates_verified_jaccard(textdocs):
    out = {(r["a_id"], r["b_id"]): r["jaccard"] for r in dedup.near_duplicates(textdocs, threshold=0.5).collect()}
    assert out[(1, 2)] == 1.0
    for (a, b) in out:
        assert (a, b) != (1, 4)


def test_simhash_near_duplicates(textdocs):
    sigs = textdocs.select(
        "doc_id", dedup.simhash64(F.col("text")).alias("sig")
    ).collect()
    by_id = {r["doc_id"]: r["sig"] for r in sigs}
    assert by_id[1] == by_id[2]
    ham13 = bin((by_id[1] ^ by_id[3]) & 0xFFFFFFFFFFFFFFFF).count("1")
    ham14 = bin((by_id[1] ^ by_id[4]) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham13 < ham14
    pairs = {(r["a_id"], r["b_id"]) for r in dedup.simhash_near_duplicates(textdocs, max_hamming=8).collect()}
    assert (1, 2) in pairs


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.RandomState(0)
    vecs = rng.randn(30, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    queries = df.where(F.col("vec_id") < 3)
    out = similarity.brute_force_topk(df, queries, k=4)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    sims = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)) @ (
        vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    ).T
    for q in range(3):
        order = [i for i in np.argsort(-sims[q]) if i != q][:4]
        want = [int(i) for i in order]
        have = [n for _, n in sorted(got[q])]
        assert have == want, (q, have, want)


def test_lsh_topk_recall(spark):
    rng = np.random.RandomState(1)
    base = rng.randn(100, 16).astype("float32")
    # plant 3 clusters: near-identical neighbors for queries
    base[1] = base[0] + rng.randn(16).astype("float32") * 0.01
    base[2] = base[0] + rng.randn(16).astype("float32") * 0.01
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    queries = df.where(F.col("vec_id") == 0)
    out = similarity.lsh_topk(df, queries, k=3, dim=16, bits=12, bands=4)
    neigh = {r["neighbor_id"] for r in out.collect()}
    assert 1 in neigh and 2 in neigh  # planted near-identical vectors found


def test_text_stats(textdocs):
    out = {r["doc_id"]: r.asDict() for r in textstats.with_text_stats(textdocs).collect()}
    assert out[1]["lang_pred"] == "en"
    assert out[5]["lang_pred"] == "de"
    assert out[6]["lang_pred"] == "fr"
    assert out[7]["n_tokens"] == 0 and out[7]["lang_pred"] == "und"
    assert out[8]["lang_pred"] == "und"
    assert out[1]["quality_score"] > out[8]["quality_score"]
    assert out[1]["doc_fingerprint"] == out[2]["doc_fingerprint"]
    assert out[1]["n_tokens"] == 14
    assert out[1]["bpe_token_count"] >= out[1]["n_tokens"]


def test_rolling_fingerprints_containment(spark):
    a = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"
    b = "PREFIX " + a + " SUFFIX"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = {
        r["doc_id"]: set(r["fp"])
        for r in df.select(
            "doc_id", textstats.rolling_fingerprints(F.col("text")).alias("fp")
        ).collect()
    }
    # a's sampled shingle hashes must largely be contained in b's
    if out[1]:
        assert len(out[1] & out[2]) / len(out[1]) >= 0.5


def test_multimodal_features_and_frames(spark):
    media = multimodal.synth_media(spark, n=30)
    feats = multimodal.extract_media_features(media).collect()
    assert len(feats) == 30
    assert all(r["decode_ok"] for r in feats)
    assert all(len(r["feat"]) == 64 for r in feats)
    by_key = {r["media_key"]: r["feat"] for r in feats}
    feats2 = multimodal.extract_media_features(media).collect()
    assert {r["media_key"]: r["feat"] for r in feats2} == by_key  # deterministic

    frames = multimodal.sample_frames(media).collect()
    vids = media.where(F.col("kind") == "video").count()
    assert len(frames) == vids * 3  # 3500ms at 1000ms sampling -> 3 frames
    assert all(len(r["frame_sha256"]) == 64 for r in frames)


def test_simhash_hot_bucket_guard(spark):
    """A degenerate band bucket (identical flood docs) is dropped by
    max_bucket, bounding the candidate join; small buckets are untouched."""
    flood = [(i, "identical flood text that collapses to one signature value")
             for i in range(30)]
    pairq = [
        (100, "a genuinely unique document about alpha beta gamma delta"),
        (101, "a genuinely unique document about alpha beta gamma delta"),
    ]
    docs = spark.createDataFrame(flood + pairq, "doc_id long, text string")
    guarded = {(r["a_id"], r["b_id"])
               for r in dedup.simhash_near_duplicates(docs, max_bucket=10).collect()}
    assert (100, 101) in guarded
    assert not any(a < 100 and b < 100 for a, b in guarded)  # flood pairs dropped
    unguarded = {(r["a_id"], r["b_id"])
                 for r in dedup.simhash_near_duplicates(docs, max_bucket=None).collect()}
    assert sum(1 for a, b in unguarded if a < 100 and b < 100) == 30 * 29 // 2


def test_hyperplane_signature_null_and_ragged_guard(spark):
    """Null / wrong-dimension embedding cells degrade to NULL signatures
    instead of raising inside the Arrow batch (round-2 ADVICE)."""
    rows = [(1, [0.5] * 8), (2, None), (3, [0.1] * 5), (4, [-0.5] * 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["sig"]
        for r in df.select(
            "vec_id",
            similarity.hyperplane_signature(F.col("embedding"), dim=8, bits=12).alias("sig"),
        ).collect()
    }
    assert out[2] is None and out[3] is None
    assert out[1] is not None and out[4] is not None
    # valid rows score identically with and without malformed neighbors
    clean = {
        r["vec_id"]: r["sig"]
        for r in spark.createDataFrame([rows[0], rows[3]], "vec_id long, embedding array<double>")
        .select("vec_id", similarity.hyperplane_signature(F.col("embedding"), dim=8, bits=12).alias("sig"))
        .collect()
    }
    assert clean[1] == out[1] and clean[4] == out[4]
