"""DSIR — Data Selection via Importance Resampling.

Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" (arXiv:2302.03169): fit hashed-n-gram bag-of-words models on a
small TARGET corpus (the distribution you want, e.g. Wikipedia/books) and
on the RAW web corpus, score every raw document with the log importance
weight  ``Σ_g  log p̂_target(h(g)) − log p̂_raw(h(g))``  over its grams,
and resample with Gumbel-top-k so the selected subset is distributed like
the target.

Spark-first shape:

- grams (unigrams + bigrams of the shared ``normalized_words``) hash into
  ``n_buckets`` md5 buckets ENTIRELY in JVM expressions — the same
  engine-portable ``md5(salt:gram)`` arithmetic as ``prep.hash_split``, so
  a DuckDB oracle replays bucket ids bit-for-bit;
- both bucket distributions are ONE groupBy each over ≤ n_buckets keys —
  tiny results that join back broadcast-eligibly (never a shuffle keyed
  on the corpus);
- per-doc weights are one explode → broadcast join → (key) groupBy sum:
  a single corpus-keyed shuffle with map-side partial aggregation;
- selection is deterministic Gumbel-top-k: the noise is a pure function
  of (salt, key) — ``-ln(-ln(u))`` over the md5 unit fraction — and the
  top-k compiles to TakeOrderedAndProject (partial per-partition top-k,
  never a global sort).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from tantiny_spark.pipeline.decontam import normalized_words
from tantiny_spark.pipeline.prep import _HASH_SPACE, hash_fraction

DEFAULT_BUCKETS = 8192


def hashed_gram_buckets(
    col, n_buckets: int = DEFAULT_BUCKETS, salt: str = "dsir"
) -> "F.Column":
    """Array of hashed-n-gram bucket ids (unigrams + bigrams) for a text
    column — ``int(md5(salt ':' gram)[:8], 16) % n_buckets``, all JVM."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    words = normalized_words(col)

    def gramify(w):
        # w is the BOUND word array: referencing ``words`` inside the
        # per-element lambda would re-split the whole document per bigram
        # (Catalyst inlines reused Columns — O(words²); see
        # dedup.shingles_col)
        bigrams = F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(w, i), F.element_at(w, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(w, bigrams)

    grams = F.element_at(F.transform(F.array(words), gramify), 1)
    return F.transform(
        grams,
        lambda g: (
            F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"), g)), 1, 8), 16, 10)
            .cast("long") % n_buckets
        ).cast("int"),
    )


def raw_bucket_counts(
    df: DataFrame, text: str = "text",
    n_buckets: int = DEFAULT_BUCKETS, salt: str = "dsir",
) -> DataFrame:
    """Fit the raw hashed-n-gram model once — (bucket, ct, n_buckets,
    salt) over the whole corpus. Persist/write this and feed it to
    ``dsir_log_weights`` via ``raw_counts`` so repeated selections don't
    re-tokenize 100 TB. The two constant columns stamp the model's
    hashing config so a selection run with a DIFFERENT n_buckets/salt
    fails loud instead of silently scoring against a mismatched model."""
    return _bucket_counts(df, text, n_buckets, salt).select(
        "bucket", "ct",
        F.lit(int(n_buckets)).alias("n_buckets"),
        F.lit(salt).alias("salt"),
    )


def _bucket_counts(df: DataFrame, text: str, n_buckets: int, salt: str) -> DataFrame:
    return (
        df.select(
            F.explode(hashed_gram_buckets(F.col(text), n_buckets, salt)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("ct"))
    )


def dsir_log_weights(
    df: DataFrame,
    target: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    salt: str = "dsir",
    raw_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-document log importance weight of ``df`` rows toward the
    ``target`` distribution. Returns (key, n_grams, log_weight) — docs
    with zero grams get log_weight 0.0 (no evidence either way).

    Both hashed models are add-one smoothed over the bucket space:
    ``p̂(b) = (count(b) + 1) / (total + n_buckets)``, so empty buckets
    stay finite and the weight of an unseen gram is a constant prior
    ratio. The raw model is fit on ``df`` itself, matching the paper
    (raw = the corpus being selected from) — at 100 TB that means two
    tokenization passes over the corpus, so pass ``raw_counts`` (a
    (bucket, ct) frame from :func:`raw_bucket_counts`, fit ONCE and
    persisted/written) to reuse the model across selection runs."""
    if raw_counts is None:
        raw_counts = _bucket_counts(df, text, n_buckets, salt)
    elif {"n_buckets", "salt"} <= set(raw_counts.columns):
        # raw_bucket_counts-stamped model: validate the hashing config
        # matches this call (one tiny 1-row collect), then drop the stamps
        cfg = raw_counts.select("n_buckets", "salt").limit(1).collect()
        if cfg and (cfg[0]["n_buckets"] != n_buckets or cfg[0]["salt"] != salt):
            raise ValueError(
                f"raw_counts was fit with n_buckets={cfg[0]['n_buckets']} "
                f"salt={cfg[0]['salt']!r} but this call uses "
                f"n_buckets={n_buckets} salt={salt!r} — weights would be "
                "silently wrong; refit with raw_bucket_counts"
            )
        raw_counts = raw_counts.select("bucket", "ct")
    tgt_counts = _bucket_counts(target, text, n_buckets, salt)
    # two scalar totals (the Weight-phase pattern: tiny collects, then
    # literals in the scoring expression)
    raw_total = raw_counts.agg(F.sum("ct")).collect()[0][0] or 0
    tgt_total = tgt_counts.agg(F.sum("ct")).collect()[0][0] or 0
    w = (
        raw_counts.withColumnRenamed("ct", "cr")
        .join(tgt_counts.withColumnRenamed("ct", "cts"), "bucket", "full")
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("cts"), F.lit(0)) + 1.0) / float(tgt_total + n_buckets))
                - F.log((F.coalesce(F.col("cr"), F.lit(0)) + 1.0) / float(raw_total + n_buckets))
            ).alias("lw"),
        )
    )
    exploded = df.select(
        F.col(key),
        F.explode_outer(hashed_gram_buckets(F.col(text), n_buckets, salt)).alias("bucket"),
    )
    # a gram whose bucket is in NEITHER model (possible only with a
    # pre-fit raw model from a different corpus) still carries the
    # smoothed prior ratio log((0+1)/(tgt_total+B)) - log((0+1)/
    # (raw_total+B)) — without it, novel-vocabulary docs would silently
    # score those grams as 0
    prior = math.log(raw_total + n_buckets) - math.log(tgt_total + n_buckets)
    return (
        exploded.join(w, "bucket", "left")
        .groupBy(key)
        .agg(
            F.count(F.col("bucket")).cast("long").alias("n_grams"),
            F.round(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("bucket").isNotNull(),
                            F.coalesce(F.col("lw"), F.lit(prior)),
                        )
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("log_weight"),
        )
    )


def dsir_sample(
    weighted: DataFrame,
    n: int,
    key: str = "doc_id",
    salt: str = "dsir-sample",
    weight: str = "log_weight",
) -> DataFrame:
    """Gumbel-top-k importance resampling: add ``-ln(-ln(u))`` noise (u =
    the deterministic md5 unit fraction of (salt, key)) to each log weight
    and keep the ``n`` highest — a without-replacement sample ∝ exp(log
    weight), reproducible on any engine. Ties pin to key asc."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # md5 fraction is in [0, 1); guard the u=0 pole (-ln(-ln(0)) = -inf
    # would silently drop the row from the top-k)
    u = F.greatest(hash_fraction(key, salt), F.lit(1.0 / _HASH_SPACE))
    g = -F.log(-F.log(u))
    scored = weighted.withColumn("gumbel_score", F.round(F.col(weight) + g, 6))
    return scored.orderBy(
        F.col("gumbel_score").desc(), F.col(key).asc()
    ).limit(n)
