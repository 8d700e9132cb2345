"""ANN recall floors — the quality contract behind BENCH/ANN_RECALL.md.

Everything here is deterministic (synthetic_vectors seeds by (seed,
vec_id); codebook/centroid training seeds are fixed), so the floors are
stable: a regression in IVF assignment, residual encoding, ADC tables or
the rerank stage shows up as a recall drop, not flakiness."""

import numpy as np
import pytest

from tantiny_spark.pipeline.similarity import (
    exact_topk_sets,
    ivf_topk,
    ivfpq_topk,
    kmeans_fit,
    pq_encode,
    pq_train,
    recall_at_k,
    synthetic_centers,
    synthetic_vectors,
)

N = 20_000
DIM = 64
NLIST = 64
K = 10
N_QUERIES = 8


@pytest.fixture(scope="module")
def corpus(spark):
    df = synthetic_vectors(spark, N, DIM, 64, seed=7).persist()
    df.count()
    centers = synthetic_centers(DIM, 64, 7)
    queries = []
    for qi in range(N_QUERIES):
        g = np.random.default_rng(10_000_019 + qi).standard_normal(DIM)
        v = centers[qi % 64] + 0.6 * g / np.linalg.norm(g)
        queries.append(list(v / np.linalg.norm(v)))
    centroids = kmeans_fit(df, NLIST, DIM, n_iter=3, sample=2048)
    gt = exact_topk_sets(df, queries, K)
    yield df, queries, centroids, gt
    df.unpersist()


def test_ivf_recall_floor(corpus):
    df, queries, centroids, gt = corpus
    r = recall_at_k(
        df, queries, K,
        lambda d, q, k: ivf_topk(d, centroids, q, k, n_probe=4),
        ground_truth=gt,
    )
    assert r >= 0.85, r


def test_ivfpq_residual_beats_raw_and_rerank_floor(corpus):
    df, queries, centroids, gt = corpus
    raw_books = pq_train(df, m=8, k=64, n_iter=5, sample=2048)
    res_books = pq_train(df, m=8, k=64, n_iter=5, sample=2048,
                         centroids=centroids)
    raw = recall_at_k(
        df, queries, K,
        lambda d, q, k: ivfpq_topk(d, centroids, raw_books, q, k, n_probe=4),
        ground_truth=gt,
    )
    resid = recall_at_k(
        df, queries, K,
        lambda d, q, k: ivfpq_topk(
            d, centroids, res_books, q, k, n_probe=4, residual=True
        ),
        ground_truth=gt,
    )
    # residual encoding (FAISS IndexIVFPQ) must beat raw-vector PQ
    assert resid > raw, (resid, raw)
    # ... and the IndexRefine rerank stage must lift it to usable recall
    rerank = recall_at_k(
        df, queries, K,
        lambda d, q, k: ivfpq_topk(
            d, centroids, res_books, q, k, n_probe=4, rerank=20,
            residual=True,
        ),
        ground_truth=gt,
    )
    assert rerank >= 0.6, rerank
    assert rerank > resid, (rerank, resid)


def test_residual_encoding_roundtrip_exactness(spark):
    """With k >= number of distinct residuals, residual PQ is lossless:
    ADC ranks exactly like the true distances, so top-k equals brute
    force — a structural identity check independent of recall floors."""
    from tantiny_spark.pipeline.similarity import brute_force_topk

    df = synthetic_vectors(spark, 64, 16, 4, noise=0.3, seed=11).persist()
    centroids = kmeans_fit(df, 4, 16, n_iter=3, sample=64)
    books = pq_train(df, m=4, k=64, n_iter=8, sample=64,
                     centroids=centroids)
    enc = pq_encode(df, books, centroids=centroids)
    q = list(np.asarray(df.orderBy("vec_id").first()["embedding"], dtype=float))
    exact = [r["vec_id"] for r in brute_force_topk(df, q, 5).collect()]
    got = [
        r["vec_id"]
        for r in ivfpq_topk(
            enc, centroids, books, q, 5, n_probe=4, rerank=5, residual=True
        ).collect()
    ]
    assert got == exact
