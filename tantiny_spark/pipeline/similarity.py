"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline, one scan + TakeOrderedAndProject.
  The dot product is pure JVM expression (zip_with + aggregate) — no Python.
- LSH-bucketed ANN: sign-random-projection buckets computed from a seeded
  deterministic hyperplane set; queries only scan their bucket (and
  neighboring probes), the 100 TB scale path.
- IVF-style variant: coarse centroids from a deterministic k-means init
  (k-means++ seeding only — good enough for bucketing), Pandas-UDF assignment.
- product quantization (pq_train/pq_encode/pq_topk): per-subspace codebooks
  compress each vector to m codes; queries score by asymmetric distance
  against a literal lookup table — a pure JVM scan over (key, pq_code) that
  never reads the vectors. Compose with ivf_assign for the standard IVF-PQ
  100 TB layout (partition pruning × compressed scan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def cosine_expr(vec_col, query: list) -> "F.Column":
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.sqrt(np.dot(query, query))) or 1.0
    return _dot(vec_col.cast("array<double>"), q) / (_norm(vec_col.cast("array<double>")) * F.lit(qn))


def brute_force_topk(
    df: DataFrame, query: list, k: int = 10,
    vec: str = "embedding", key: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against one query vector. Deterministic tie-break
    on the key; compiles to per-partition partial top-k (no global sort)."""
    scored = df.select(
        F.col(key), F.round(cosine_expr(F.col(vec), query), 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(key).asc()).limit(k)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def with_lsh_bucket(
    df: DataFrame, dim: int, n_planes: int = 8, seed: int = 42,
    vec: str = "embedding",
) -> DataFrame:
    """Sign-random-projection bucket id (0..2^n_planes-1), fully JVM-side:
    each plane's dot product is a zip_with/aggregate against a literal array."""
    planes = random_hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    v = F.col(vec).cast("array<double>")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(v, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return df.withColumn("lsh_bucket", bucket)


def lsh_topk(
    df: DataFrame, query: list, k: int = 10, n_planes: int = 8, seed: int = 42,
    vec: str = "embedding", key: str = "vec_id",
) -> DataFrame:
    """ANN path: scan only the query's bucket. At scale the table is written
    partitioned by lsh_bucket so this is partition pruning, not a filter."""
    dim = len(query)
    planes = random_hyperplanes(dim, n_planes, seed)
    qbits = (planes @ np.asarray(query) > 0).astype(int)
    qbucket = int(sum(b << i for i, b in enumerate(qbits)))
    bucketed = with_lsh_bucket(df, dim, n_planes, seed, vec)
    return brute_force_topk(
        bucketed.where(F.col("lsh_bucket") == qbucket), query, k, vec, key
    )


def cosine_near_dup_pairs(
    df: DataFrame, dim: int, threshold: float = 0.95,
    n_planes: int = 8, seed: int = 42,
    vec: str = "embedding", key: str = "vec_id",
) -> DataFrame:
    """Embedding near-duplicate pairs: sign-random-projection buckets bound
    the candidate set (pairs only meet inside a bucket — no n² blowup), then
    exact cosine verifies each candidate against ``threshold``. All JVM-side
    (plane dot products are zip_with/aggregate over literal arrays, the
    verify is the same expression as brute_force_topk). Standard LSH recall
    tradeoff: a near-dup pair straddling a hyperplane is missed — raise
    recall by lowering n_planes or OR-ing several seeds."""
    bucketed = with_lsh_bucket(df, dim, n_planes, seed, vec)
    left = bucketed.select(
        F.col(key).alias("a"), F.col(vec).alias("va"), F.col("lsh_bucket").alias("ba")
    )
    right = bucketed.select(
        F.col(key).alias("b"), F.col(vec).alias("vb"), F.col("lsh_bucket").alias("bb")
    )
    va = F.col("va").cast("array<double>")
    vb = F.col("vb").cast("array<double>")
    cosine = _dot(va, vb) / (_norm(va) * _norm(vb))
    return (
        left.join(
            right, (F.col("ba") == F.col("bb")) & (F.col("a") < F.col("b"))
        )
        .select("a", "b", F.round(cosine, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def ivf_assign(
    df: DataFrame, centroids: np.ndarray, vec: str = "embedding", key: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (Arrow-vectorized numpy:
    one matmul per batch). The IVF 'coarse quantizer' of a 100 TB ANN index —
    write the table partitioned by cell, probe a handful of cells at query
    time."""
    cents = centroids.astype(np.float64)

    @F.pandas_udf(T.IntegerType())
    def _assign(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())
        # cosine: normalize rows then argmax of dot with normalized centroids
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(mn @ cn.T, axis=1).astype("int32"))

    return df.withColumn("ivf_cell", _assign(F.col(vec)))


def _probe_cells(centroids: np.ndarray, query, n_probe: int) -> list:
    """The ``n_probe`` nearest coarse cells to the query by cosine —
    driver-side numpy over the tiny centroid matrix (shared by the IVF
    and IVF-PQ read paths; stable argsort pins tie order)."""
    cents = np.asarray(centroids, dtype=np.float64)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    order = np.argsort(-(cn @ qn), kind="stable")
    return [int(c) for c in order[: max(n_probe, 1)]]


def ivf_topk(
    df: DataFrame, centroids: np.ndarray, query: list, k: int = 10,
    n_probe: int = 2, vec: str = "embedding", key: str = "vec_id",
) -> DataFrame:
    """IVF probe query — the read side of the coarse quantizer: rank the
    centroids by cosine against the query (driver-side numpy over a tiny
    matrix), scan ONLY the ``n_probe`` nearest cells, exact-score the
    survivors. At scale the vector table is written partitioned by
    ``ivf_cell``, so the cell filter is partition pruning: a 100 TB ANN
    query touches n_probe/n_cells of the data. ``n_probe = len(centroids)``
    degrades to exact brute force (useful as a recall oracle in tests)."""
    probe = _probe_cells(centroids, query, n_probe)
    assigned = df if "ivf_cell" in df.columns else ivf_assign(df, centroids, vec, key)
    return brute_force_topk(
        assigned.where(F.col("ivf_cell").isin(probe)), query, k, vec, key
    )


def deterministic_centroids(df: DataFrame, k: int, vec: str = "embedding",
                            key: str = "vec_id", sample: int = 1024) -> np.ndarray:
    """k-means++-style seeding from a deterministic ordered sample (first
    `sample` rows by key) — stable across parallelism levels."""
    rows = (
        df.orderBy(key).limit(sample).select(vec).collect()
    )
    pts = np.array([r[0] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(42)
    cents = [pts[0]]
    # incremental min-distance: update with the newest centroid only —
    # O(k·n·d), not O(k²·n·d); identical values (min is associative), so
    # the seeding (and every centroid) is bit-for-bit what the old
    # recompute-everything loop produced
    d = np.sum((pts - cents[0]) ** 2, axis=1)
    for _ in range(1, k):
        probs = d / d.sum() if d.sum() > 0 else None
        cents.append(pts[rng.choice(len(pts), p=probs)])
        d = np.minimum(d, np.sum((pts - cents[-1]) ** 2, axis=1))
    return np.vstack(cents)


def kmeans_fit(
    df: DataFrame, k: int, dim: int, n_iter: int = 5,
    vec: str = "embedding", key: str = "vec_id", sample: int = 1024,
) -> np.ndarray:
    """Spherical k-means for the IVF coarse quantizer: deterministic
    k-means++ seeding, then ``n_iter`` distributed Lloyd rounds matching the
    cosine assignment (centroids re-normalized each round).

    Scale shape: each round is ONE narrow aggregation — the per-cell
    element-wise sums are ``dim`` SUM expressions over the assigned frame
    (map-side partial agg, k·dim result rows on the driver), never an
    explode of n·dim rows and never a collect of the vectors. Empty cells
    keep their previous centroid. Deterministic at any parallelism."""
    cents = deterministic_centroids(df, k, vec, key, sample)
    v = F.col(vec).cast("array<double>")
    for _ in range(max(0, n_iter)):
        assigned = ivf_assign(df, cents, vec, key).withColumn(
            # spherical k-means sums ROW-NORMALIZED vectors: the assignment
            # and the objective are cosine (direction only), so a raw-sum
            # mean would let a few long vectors drag the centroid off the
            # cosine-mean direction and the rounds could ascend the
            # objective instead of descending it
            "__vn", F.greatest(_norm(v), F.lit(1e-12))
        )
        rows = (
            assigned.groupBy("ivf_cell")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.element_at(v, i + 1) / F.col("__vn")).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new = cents.copy()
        for r in rows:
            mean = np.array([r[f"s{i}"] for i in range(dim)]) / max(r["n"], 1)
            norm = float(np.linalg.norm(mean))
            if norm > 1e-12:
                new[r["ivf_cell"]] = mean / norm
        cents = new
    return cents


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def pq_train(
    df: DataFrame, m: int = 4, k: int = 16, n_iter: int = 10,
    vec: str = "embedding", key: str = "vec_id", sample: int = 1024,
    seed: int = 42, centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    (row-normalized) vector into ``m`` subspaces and run an independent
    L2 k-means with ``k`` centroids in each. Returns (m, k, dim/m).

    Training runs driver-side numpy over a DETERMINISTIC bounded sample
    (first ``sample`` rows by key) — the standard PQ practice (FAISS
    trains codebooks on a sample): codebook quality needs a representative
    sample, not the corpus, so training cost is O(sample·m·k·iters)
    regardless of corpus size. Encoding and querying are the distributed
    parts (``pq_encode`` / ``pq_topk``). Vectors are normalized first so
    ADC's L2 ranking matches the module's cosine ranking.

    ``centroids``: when the IVF coarse centroids are given, codebooks are
    trained on the RESIDUALS x̂ − ĉ(x̂) — FAISS's IndexIVFPQ semantics
    (Jégou et al. 2011 §IV): residuals concentrate near 0, so the same
    m·log2(k) bits resolve WITHIN-cell distances instead of re-spending
    them on the cell position the IVF assignment already encodes. Pass the
    same centroids to pq_encode/pq_topk/ivfpq_topk."""
    if m < 1 or k < 1:
        raise ValueError("m and k must be >= 1")
    rows = df.orderBy(key).limit(sample).select(vec).collect()
    if not rows:
        raise ValueError("pq_train needs a non-empty vector table")
    pts = np.array([r[0] for r in rows], dtype=np.float64)
    dim = pts.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} is not divisible by m={m} subspaces")
    d = dim // m
    pts = _unit_rows(pts)
    if centroids is not None:
        cn = _unit_rows(np.asarray(centroids, dtype=np.float64))
        pts = pts - cn[np.argmax(pts @ cn.T, axis=1)]
    books = np.zeros((m, k, d), dtype=np.float64)
    for s in range(m):
        sub = pts[:, s * d:(s + 1) * d]
        rng = np.random.default_rng(seed + s)
        # k-means++ seeding over the sample; duplicate-heavy subspaces pad
        # with the first centroid (argmin ties resolve to the lowest code,
        # so padding never changes an assignment)
        cents = [sub[0]]
        # incremental min-distance (same values as recomputing the min over
        # every centroid — see deterministic_centroids): O(k·n·d) seeding,
        # which is what makes FAISS-style k=256 codebooks tractable
        dist = np.sum((sub - cents[0]) ** 2, axis=1)
        for _ in range(1, k):
            tot = float(dist.sum())
            if tot <= 1e-24:
                break
            cents.append(sub[rng.choice(len(sub), p=dist / tot)])
            dist = np.minimum(dist, np.sum((sub - cents[-1]) ** 2, axis=1))
        cb = np.vstack(cents + [cents[0]] * (k - len(cents)))
        for _ in range(max(0, n_iter)):
            codes = np.argmin(
                ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2), axis=1
            )
            for c in range(k):
                mask = codes == c
                if mask.any():
                    cb[c] = sub[mask].mean(axis=0)
        books[s] = cb
    return books


def pq_encode(
    df: DataFrame, codebooks: np.ndarray,
    vec: str = "embedding", key: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Encode every vector as ``m`` one-byte-ish codes (nearest centroid
    per subspace, after row normalization) — the compressed representation
    a 100 TB ANN index actually stores: m·log2(k) bits per vector instead
    of dim·32. Arrow-vectorized numpy, one (batch × k) distance matrix per
    subspace per batch; adds a ``pq_code`` array<int> column.

    With ``centroids`` (FAISS IVFPQ residual mode) each row encodes
    x̂ − ĉ[ivf_cell] against residual-trained codebooks; the ``ivf_cell``
    column is computed if absent (at scale it is precomputed at write
    time and the table partitioned by it)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, k, d = books.shape

    if centroids is not None:
        cn = _unit_rows(np.asarray(centroids, dtype=np.float64))
        if "ivf_cell" not in df.columns:
            df = ivf_assign(df, centroids, vec, key)

        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def _enc_resid(vecs: pd.Series, cells: pd.Series) -> pd.Series:
            mat = _unit_rows(np.vstack(vecs.to_numpy()).astype(np.float64))
            if mat.shape[1] != m * d:
                raise ValueError(
                    f"pq_encode: vector dim {mat.shape[1]} != codebooks' "
                    f"m*d = {m * d}"
                )
            mat = mat - cn[cells.to_numpy().astype(np.int64)]
            codes = np.empty((len(mat), m), dtype=np.int32)
            for s in range(m):
                sub = mat[:, s * d:(s + 1) * d]
                dist = -2.0 * (sub @ books[s].T) + (books[s] ** 2).sum(axis=1)
                codes[:, s] = np.argmin(dist, axis=1)
            return pd.Series(list(codes))

        return df.withColumn(
            "pq_code", _enc_resid(F.col(vec), F.col("ivf_cell"))
        )

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _enc(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        if mat.shape[1] != m * d:
            raise ValueError(
                f"pq_encode: vector dim {mat.shape[1]} != codebooks' "
                f"m*d = {m * d} — codes would silently drop/misscale "
                "dimensions"
            )
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(mat), m), dtype=np.int32)
        for s in range(m):
            sub = mat[:, s * d:(s + 1) * d]
            # ||x - c||² = ||x||² - 2x·c + ||c||²; ||x||² is rank-constant
            dist = -2.0 * (sub @ books[s].T) + (books[s] ** 2).sum(axis=1)
            codes[:, s] = np.argmin(dist, axis=1)
        return pd.Series(list(codes))

    return df.withColumn("pq_code", _enc(F.col(vec)))


def pq_topk(
    df: DataFrame, codebooks: np.ndarray, query: list, k: int = 10,
    vec: str = "embedding", key: str = "vec_id", rerank: int | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """PQ top-k by ASYMMETRIC distance (ADC): the driver computes the tiny
    (m × K) lookup table of squared L2 distances from each normalized
    query sub-vector to every centroid, and the scan scores each code
    array with a pure JVM sum of ``element_at`` lookups against the
    literal table — ZERO Python in the hot path, per-partition partial
    top-k (TakeOrderedAndProject), and the scan reads only (key, pq_code):
    the full vectors never leave storage. Combine with ``ivf_assign``
    cells for the classic IVF-PQ layout (partition pruning × compressed
    scan). Ranking matches cosine because train/encode/query all
    normalize. Returns (key, pq_dist) ascending.

    ``centroids``: residual-ADC mode (codes from residual-trained
    codebooks; see pq_train). ``rerank``: FAISS IndexRefine stage — ADC
    shortlists rerank·k candidates, their full vectors are exact-scored;
    returns (key, cosine) descending instead."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, K, d = books.shape
    q = np.asarray(query, dtype=np.float64)
    if q.shape[0] != m * d:
        raise ValueError(f"query dim {q.shape[0]} != m*d = {m * d}")
    q = q / max(float(np.linalg.norm(q)), 1e-12)

    if centroids is not None:
        # residual ADC (FAISS IVFPQ): the lookup table depends on the cell —
        # dist(q, c + r) needs (q − ĉ[cell]) per probed cell. The per-cell
        # (m × K) tables are a small numpy closure shipped once per task and
        # scored with Arrow-batched take()+sum — the same SIMD-lookup scan
        # FAISS runs per inverted list, still reading only (key, cell, code).
        cn = _unit_rows(np.asarray(centroids, dtype=np.float64))
        qr = q[None, :] - cn  # (n_cells, dim)
        luts = np.stack([
            ((qr[:, None, s * d:(s + 1) * d] - books[s][None, :, :]) ** 2)
            .sum(axis=2)
            for s in range(m)
        ], axis=1)  # (n_cells, m, K)
        encoded = (
            df if "pq_code" in df.columns
            else pq_encode(df, books, vec, key, centroids=centroids)
        )

        @F.pandas_udf(T.DoubleType())
        def _adc(cells: pd.Series, codes: pd.Series) -> pd.Series:
            cell_arr = cells.to_numpy().astype(np.int64)
            code_mat = np.vstack(codes.to_numpy()).astype(np.int64)
            t = luts[cell_arr]  # (batch, m, K)
            dist = np.take_along_axis(
                t, code_mat[:, :, None], axis=2
            )[:, :, 0].sum(axis=1)
            return pd.Series(np.round(dist, 6))

        scored = encoded.select(
            F.col(key), _adc(F.col("ivf_cell"), F.col("pq_code")).alias("pq_dist")
        )
    else:
        lut = np.stack([
            ((books[s] - q[s * d:(s + 1) * d]) ** 2).sum(axis=1)
            for s in range(m)
        ])  # (m, K)
        encoded = df if "pq_code" in df.columns else pq_encode(df, books, vec, key)
        dist = F.lit(0.0)
        for s in range(m):
            table = F.array(*[F.lit(round(float(x), 12)) for x in lut[s]])
            dist = dist + F.element_at(
                table, F.element_at("pq_code", s + 1) + F.lit(1)
            )
        scored = encoded.select(F.col(key), F.round(dist, 6).alias("pq_dist"))
    if rerank is None:
        return scored.orderBy(F.col("pq_dist").asc(), F.col(key).asc()).limit(k)
    # FAISS IndexRefine / IVFPQR stage: the compressed scan shortlists
    # rerank·k candidates by ADC, then ONLY those rows' full vectors are
    # read and exact-cosine-scored (a semi-join of ~rerank·k keys) — the
    # standard way PQ recall@k recovers quantization loss without ever
    # scanning uncompressed vectors. Returns (key, cosine) descending.
    cand = (
        scored.orderBy(F.col("pq_dist").asc(), F.col(key).asc())
        .limit(int(rerank) * k)
        .select(key)
    )
    return brute_force_topk(
        encoded.join(F.broadcast(cand), key, "left_semi"), query, k, vec, key
    )


def ivfpq_topk(
    df: DataFrame, centroids: np.ndarray, codebooks: np.ndarray,
    query: list, k: int = 10, n_probe: int = 2,
    vec: str = "embedding", key: str = "vec_id", rerank: int | None = None,
    residual: bool = False,
) -> DataFrame:
    """The full IVF-PQ read path (FAISS's default 100 TB layout): rank the
    coarse centroids driver-side, scan ONLY the ``n_probe`` nearest cells
    (partition pruning when the table is written partitioned by
    ``ivf_cell``), and rank the survivors by PQ asymmetric distance — so
    the probe reads just (key, ivf_cell, pq_code), never the vectors.
    Pre-assign and pre-encode at write time (``ivf_assign`` +
    ``pq_encode``); both are recomputed here only as a small-data
    convenience. Returns (key, pq_dist) ascending."""
    probe = _probe_cells(centroids, query, n_probe)
    assigned = (
        df if "ivf_cell" in df.columns else ivf_assign(df, centroids, vec, key)
    )
    resid_cents = centroids if residual else None
    encoded = (
        assigned if "pq_code" in assigned.columns
        else pq_encode(assigned, codebooks, vec, key, centroids=resid_cents)
    )
    return pq_topk(
        encoded.where(F.col("ivf_cell").isin(probe)), codebooks, query, k,
        vec, key, rerank=rerank, centroids=resid_cents,
    )


def quantization_error(
    df: DataFrame, centroids: np.ndarray, vec: str = "embedding",
    key: str = "vec_id",
) -> float:
    """Mean (1 − cosine(vector, assigned centroid)) — the objective the
    spherical Lloyd rounds descend; exposed for tests/monitoring."""
    cents = centroids.astype(np.float64)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf(T.DoubleType())
    def _err(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mn @ cn.T
        return pd.Series(1.0 - sims.max(axis=1))

    return float(
        df.select(F.avg(_err(F.col(vec))).alias("e")).collect()[0]["e"]
    )


def synthetic_vectors(
    spark, n: int, dim: int = 64, n_clusters: int = 64,
    noise: float = 0.6, seed: int = 7,
) -> DataFrame:
    """Deterministic clustered vector corpus for ANN recall evaluation —
    (vec_id, embedding array<float>, label). Row i is unit-normalized
    ``center[i % n_clusters] + noise·ĝ(i)`` where ĝ is a UNIT-norm Gaussian
    direction (so ``noise`` is the actual perturbation magnitude relative
    to the unit center — a raw N(0,I_dim) draw would have norm ~sqrt(dim)
    and swamp the cluster structure). Centers and ĝ(i) are seeded ONLY by
    (seed, i): any partitioning, any parallelism, any executor count
    produces bit-identical vectors, so recall numbers are reproducible
    across cluster sizes (the north-rule requirement). The generator is
    Spark-side (range → mapInPandas), so a 100M-row corpus never touches
    the driver."""
    books = synthetic_centers(dim, n_clusters, seed)

    def gen(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy()
            out = np.empty((len(ids), dim), dtype=np.float64)
            for j, i in enumerate(ids):
                g = np.random.default_rng((seed << 32) ^ int(i)).standard_normal(dim)
                g /= max(float(np.linalg.norm(g)), 1e-12)
                out[j] = books[int(i) % n_clusters] + noise * g
            out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": list(out.astype(np.float32)),
                "label": ids % n_clusters,
            })

    return (
        spark.range(n).withColumnRenamed("id", "vec_id")
        .mapInPandas(
            gen, "vec_id long, embedding array<float>, label long"
        )
    )


def synthetic_centers(dim: int, n_clusters: int, seed: int = 7) -> np.ndarray:
    """The unit-norm cluster centers synthetic_vectors plants — exposed so
    query vectors can be drawn near known clusters."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_clusters, dim))
    return c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)


def exact_topk_sets(
    df: DataFrame, queries: list, k: int,
    vec: str = "embedding", key: str = "vec_id",
) -> list:
    """Ground-truth id sets (exact cosine brute force) per query — compute
    ONCE and share across every ANN configuration under evaluation."""
    return [
        {r[key] for r in brute_force_topk(df, q, k, vec, key).collect()}
        for q in queries
    ]


def recall_at_k(
    df: DataFrame, queries: list, k: int,
    ann_fn, vec: str = "embedding", key: str = "vec_id",
    ground_truth: list | None = None,
) -> float:
    """Mean recall@k of ``ann_fn(df, query, k) -> DataFrame[key, ...]``
    against the exact cosine brute force, over the given query vectors —
    the standard ANN quality metric (Jégou et al. 2011 eval protocol).
    Pass ``ground_truth`` (from :func:`exact_topk_sets`) when scoring
    several configurations so the exact scan runs once, not per config."""
    if ground_truth is None:
        ground_truth = exact_topk_sets(df, queries, k, vec, key)
    total = 0.0
    for q, exact in zip(queries, ground_truth):
        got = {r[key] for r in ann_fn(df, q, k).collect()}
        total += len(exact & got) / float(k)
    return total / len(queries)
