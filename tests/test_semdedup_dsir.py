"""SemDeDup (arXiv:2303.09540) and DSIR (arXiv:2302.03169) tests."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tantiny_spark.pipeline.dsir import (
    dsir_log_weights,
    dsir_sample,
    hashed_gram_buckets,
)
from tantiny_spark.pipeline.semdedup import semdedup

CENTS = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_keeps_lowest_centroid_cosine(spark):
    # cluster 0 (x-axis): three near-dups of [1,0,0,0] with increasing
    # off-axis tilt — the MOST tilted (lowest cent_cos) must be kept;
    # cluster 1 (y-axis): a singleton, never in dup_map, always kept
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),
        (3, [0.99, 0.05, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    clean, dup_map = semdedup(_emb(spark, rows), CENTS, threshold=0.99)
    dm = {r["vec_id"]: r for r in dup_map.collect()}
    assert set(dm) == {1, 2, 3}
    assert all(r["cluster"] == 1 for r in dm.values())
    # keeper = argmin cent_cos = vec 3 (most diverse member)
    assert [k for k, r in dm.items() if r["keep"]] == [3]
    assert sorted(r["vec_id"] for r in clean.collect()) == [3, 4]


def test_semdedup_no_pairs_across_cells(spark):
    # two identical vectors pulled to different centroids never pair
    rows = [
        (1, [0.9, 0.8, 0.0, 0.0]),   # cell 0 (x wins)
        (2, [0.8, 0.9, 0.0, 0.0]),   # cell 1 (y wins) — cosine(1,2) ≈ 0.99
    ]
    clean, dup_map = semdedup(_emb(spark, rows), CENTS, threshold=0.9)
    assert dup_map.count() == 0
    assert clean.count() == 2


def test_semdedup_threshold_and_ties(spark):
    # identical vectors: cent_cos ties → keep the smallest key
    rows = [(7, [1.0, 0.0, 0.0, 0.0]), (9, [1.0, 0.0, 0.0, 0.0])]
    clean, dup_map = semdedup(_emb(spark, rows), CENTS, threshold=0.999)
    dm = {r["vec_id"]: r["keep"] for r in dup_map.collect()}
    assert dm == {7: True, 9: False}
    # a threshold above any pair similarity keeps everything
    clean2, dup2 = semdedup(
        _emb(spark, [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.9, 0.4, 0.0, 0.0])]),
        CENTS, threshold=0.9999,
    )
    assert dup2.count() == 0 and clean2.count() == 2


def test_semdedup_max_cluster_size_fails_loud(spark):
    rows = [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(5)]
    with pytest.raises(ValueError, match="max_cluster_size"):
        semdedup(_emb(spark, rows), CENTS, threshold=0.99, max_cluster_size=3)
    with pytest.raises(ValueError, match="threshold"):
        semdedup(_emb(spark, rows), CENTS, threshold=0.0)


# --------------------------------------------------------------------------
# DSIR
# --------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hashed_gram_buckets_shape(spark):
    df = _docs(spark, [(1, "a b c"), (2, "solo"), (3, "")])
    got = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", hashed_gram_buckets(F.col("text"), 64).alias("b")
        ).collect()
    }
    assert len(got[1]) == 5          # 3 unigrams + 2 bigrams
    assert len(got[2]) == 1          # 1 unigram, no bigrams
    assert got[3] == []              # empty doc → no grams
    assert all(0 <= b < 64 for b in got[1])
    with pytest.raises(ValueError, match="n_buckets"):
        hashed_gram_buckets(F.col("text"), 1)


def test_dsir_weights_prefer_target_like_docs(spark):
    # target is all about "quantum physics"; raw corpus mixes that with
    # boilerplate spam — the physics doc must out-weigh the spam doc
    target = _docs(spark, [
        (100, "quantum physics of fields"),
        (101, "quantum entanglement physics"),
    ])
    raw = _docs(spark, [
        (1, "quantum physics lecture notes"),
        (2, "click here buy cheap pills now"),
        (3, ""),
    ])
    w = {r["doc_id"]: r for r in dsir_log_weights(raw, target, n_buckets=512).collect()}
    assert set(w) == {1, 2, 3}
    assert w[1]["log_weight"] > w[2]["log_weight"]
    assert w[3]["n_grams"] == 0 and w[3]["log_weight"] == 0.0


def test_dsir_weight_math_matches_hand_computation(spark):
    """One-doc corpora: the weight reduces to a closed form we can check."""
    nb = 128
    target = _docs(spark, [(10, "alpha")])
    raw = _docs(spark, [(1, "alpha"), (2, "beta")])
    w = {r["doc_id"]: r["log_weight"]
         for r in dsir_log_weights(raw, target, n_buckets=nb).collect()}
    # raw total=2 grams, target total=1; 'alpha' bucket: raw ct 1, tgt ct 1
    expect_alpha = math.log((1 + 1) / (1 + nb)) - math.log((1 + 1) / (2 + nb))
    expect_beta = math.log((0 + 1) / (1 + nb)) - math.log((1 + 1) / (2 + nb))
    assert abs(w[1] - round(expect_alpha, 6)) < 1e-9
    assert abs(w[2] - round(expect_beta, 6)) < 1e-9


def test_dsir_precomputed_raw_counts_identical(spark):
    """Feeding a pre-fit raw model (the fit-once 100 TB path) must produce
    the exact same weights as the inline fit."""
    from tantiny_spark.pipeline.dsir import raw_bucket_counts

    raw = _docs(spark, [(1, "alpha beta"), (2, "beta gamma"), (3, "alpha")])
    target = _docs(spark, [(9, "alpha")])
    inline = {r["doc_id"]: r["log_weight"]
              for r in dsir_log_weights(raw, target, n_buckets=64).collect()}
    rc = raw_bucket_counts(raw, n_buckets=64)
    reused = {r["doc_id"]: r["log_weight"]
              for r in dsir_log_weights(raw, target, n_buckets=64,
                                        raw_counts=rc).collect()}
    assert inline == reused
    # a model fit under a different hashing config must fail loud, never
    # silently skew the weights
    import pytest
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_log_weights(raw, target, n_buckets=128, raw_counts=rc).collect()
    with pytest.raises(ValueError, match="salt"):
        dsir_log_weights(raw, target, n_buckets=64, salt="other",
                         raw_counts=rc).collect()


def test_dsir_sample_is_deterministic_topk(spark):
    raw = _docs(spark, [(i, f"w{i} common text") for i in range(20)])
    target = _docs(spark, [(99, "common text")])
    weighted = dsir_log_weights(raw, target, n_buckets=256)
    s1 = [r["doc_id"] for r in dsir_sample(weighted, 5).collect()]
    s2 = [r["doc_id"] for r in dsir_sample(weighted, 5).collect()]
    assert s1 == s2 and len(s1) == 5
    # a different salt reshuffles the Gumbel noise
    s3 = [r["doc_id"] for r in dsir_sample(weighted, 5, salt="other").collect()]
    assert set(s1) != set(s3) or s1 != s3
    with pytest.raises(ValueError, match="n must"):
        dsir_sample(weighted, 0)
