"""SemDeDup — semantic deduplication over an embedding column.

Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): cluster embeddings with
k-means, then within each cluster mark pairs whose cosine similarity
exceeds a threshold as semantic duplicates and keep ONE representative per
duplicate group — the paper keeps the member with the LOWEST similarity to
its cluster centroid (maximizing diversity of the survivors).

Spark-first shape (the whole point of the cluster stage is bounding the
quadratic term):

- assignment rides :func:`~tantiny_spark.pipeline.similarity.ivf_assign`
  (one Arrow-vectorized matmul per batch) — at 100 TB the table is written
  partitioned by cell, so the within-cluster self-join is co-partitioned
  and never crosses cells;
- candidate pairs exist ONLY inside a cell (never an n² corpus join), and
  an optional ``max_cluster_size`` guard fails LOUD when a degenerate
  clustering would blow the within-cell quadratic up;
- duplicate groups come from the same min-label-propagation
  :func:`~tantiny_spark.pipeline.dedup.connected_components` every other
  dedup path uses;
- the keep rule is ONE partial-aggregatable min-struct groupBy (the
  select_canonical pattern — never a per-cluster window), ranking by
  (centroid-cosine asc, key asc).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from tantiny_spark.pipeline.dedup import connected_components
from tantiny_spark.pipeline.similarity import _dot, _norm, ivf_assign


def _centroid_cosine(vec_col, centroids: np.ndarray, cell_col) -> "F.Column":
    """cosine(vec, centroids[cell]) with the centroid matrix as a 2-D
    literal — element_at by cell id, then the same JVM dot/norm expressions
    as every other cosine in the pipeline (no Python in the plan). Bounded:
    k·dim literals are fine for a coarse quantizer (the IVF/PQ convention);
    a huge codebook would bloat the plan, so fail loud instead."""
    if np.asarray(centroids).size > 65536:
        raise ValueError(
            f"centroid matrix has {np.asarray(centroids).size} elements — "
            "too large to inline as plan literals; reduce k or join a "
            "centroid table instead"
        )
    cents = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in row])
            for row in np.asarray(centroids, dtype=np.float64)
        ]
    )
    c = F.element_at(cents, cell_col.cast("int") + 1)
    v = vec_col.cast("array<double>")
    return _dot(v, c) / (_norm(v) * _norm(c))


def semdedup(
    df: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    vec: str = "embedding",
    key: str = "vec_id",
    max_cluster_size: int | None = None,
    max_iterations: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """Run SemDeDup against a fixed set of (k-means) ``centroids``.

    Returns ``(clean, dup_map)``: ``clean`` is ``df`` restricted to the
    kept rows; ``dup_map`` has one row per member of a duplicate group —
    ``(key, cluster, cent_cos, keep)`` where ``cluster`` is the group's
    min member key, ``cent_cos`` the member's cosine to its assigned
    centroid (rounded to 6 dp — the ranking precision), and ``keep``
    marks the group's surviving representative (lowest cent_cos, ties to
    the smallest key — the paper's diversity-keeping rule). Rows in no
    duplicate group are absent from ``dup_map`` and always kept.

    Train the centroids with
    :func:`~tantiny_spark.pipeline.similarity.kmeans_fit` (or pass any
    deterministic matrix — tests and oracles use fixed vectors).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    assigned = ivf_assign(df, centroids, vec, key)
    base = assigned.select(
        F.col(key).alias("__k"),
        F.col(vec).alias("__v"),
        "ivf_cell",
        F.round(
            _centroid_cosine(F.col(vec), centroids, F.col("ivf_cell")), 6
        ).alias("cent_cos"),
    )

    if max_cluster_size is not None:
        too_big = (
            base.groupBy("ivf_cell").count()
            .where(F.col("count") > max_cluster_size)
            .limit(1)
            .collect()
        )
        if too_big:
            r = too_big[0]
            raise ValueError(
                f"semdedup: cluster {r['ivf_cell']} holds {r['count']} > "
                f"max_cluster_size={max_cluster_size} vectors — the "
                "within-cluster pair join would degenerate; re-train with "
                "more centroids or raise the cap explicitly"
            )

    left = base.select(
        F.col("__k").alias("a"), F.col("__v").alias("va"),
        F.col("ivf_cell").alias("ca"),
    )
    right = base.select(
        F.col("__k").alias("b"), F.col("__v").alias("vb"),
        F.col("ivf_cell").alias("cb"),
    )
    va = F.col("va").cast("array<double>")
    vb = F.col("vb").cast("array<double>")
    cos = F.round(_dot(va, vb) / (_norm(va) * _norm(vb)), 6)
    pairs = (
        left.join(right, (F.col("ca") == F.col("cb")) & (F.col("a") < F.col("b")))
        .select("a", "b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )

    clusters = connected_components(pairs, "a", "b", max_iterations)
    dup_map = (
        clusters.join(base, clusters["node"] == base["__k"])
        .select(
            F.col("node").alias(key), F.col("label").alias("cluster"),
            F.col("cent_cos"),
        )
    )
    # keep = per group argmin of (cent_cos, key): ONE min-struct groupBy
    keepers = dup_map.groupBy("cluster").agg(
        F.min(F.struct(F.col("cent_cos"), F.col(key).alias("k"))).alias("best")
    ).select("cluster", F.col("best.k").alias("__keep_k"))
    dup_map = dup_map.join(keepers, "cluster").select(
        key, "cluster", "cent_cos",
        (F.col(key) == F.col("__keep_k")).alias("keep"),
    )
    dropped = dup_map.where(~F.col("keep")).select(key)
    clean = df.join(dropped, key, "left_anti")
    return clean, dup_map
