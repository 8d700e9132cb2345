"""Exact repeated-span detection and removal (substring-level dedup).

The doc-level ops in :mod:`dedup` drop whole near-duplicate documents;
web corpora ALSO repeat long verbatim *spans* inside otherwise-distinct
pages (licenses, navigation, quoted passages), and removing every
occurrence but one measurably improves trained models (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" — the public
ExactSubstr setting, re-expressed at k-token granularity so a pure-SQL
oracle can replay it; the paper's suffix array finds the same >=k-token
matches).

Semantics: every k-token window is hashed; a window whose hash occurs
``min_count``+ times corpus-wide is a duplicate. Each duplicated window
keeps exactly its FIRST global occurrence (smallest (doc_id, pos)); all
other occurrences become deletion intervals, merged per document into
maximal spans.

Scale shape (100 TB): the per-gram aggregation is ONE partial-aggregatable
groupBy producing (count, first-occurrence key) — the Zipf-head gram (a
boilerplate line repeated 10^9 times) folds map-side, never materializing
its occurrence list. Canonical-or-not is then a join back on the gram
hash, and interval merging is a per-document window (bounded by document
length, never corpus-wide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tantiny_spark.pipeline.textstats import tokens_col

#: doc_id is packed with pos into one BIGINT so "first occurrence" is a
#: plain min() — partial-aggregatable, unlike a struct-min in every engine.
#: 2^20 tokens/doc bounds pos (docs are chunked long before 1M tokens —
#: pipeline/prep.chunk_documents); doc_id then fits 43 bits.
_POS_BITS = 20


def _occurrences(df: DataFrame, text: str, key: str, k: int) -> DataFrame:
    """(key, pos, gram) for every k-token window; pos is 0-based.

    The token array is bound once per row via a single-element transform
    (Catalyst inlines a reused Column under every consumer, so referencing
    ``toks`` directly inside the per-window lambda would re-split the whole
    document for every window — O(tokens²); see dedup.shingles_col)."""
    toks = tokens_col(text)

    def windows(t):
        return F.when(
            F.size(t) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (k - 1)),
                lambda i: F.md5(F.array_join(F.slice(t, i, k), " ")),
            ),
        ).otherwise(F.array().cast("array<string>"))

    grams = F.element_at(F.transform(F.array(toks), windows), 1)
    return df.select(key, F.posexplode(grams).alias("pos", "gram"))


def duplicate_spans(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Deletion spans for repeated k-token sequences.

    Returns (key, start_tok, end_tok): maximal merged [start_tok, end_tok)
    token intervals covering every duplicated window EXCEPT each window's
    first global occurrence. Removing these spans keeps exactly one copy
    of every repeated >=k-token passage corpus-wide.
    """
    # the first-occurrence min-key packs (key, pos) into ONE BIGINT so the
    # groupBy folds Zipf-head grams map-side; that packing is only sound for
    # integral keys (a string key would cast to NULL and silently report
    # zero duplicate spans) and positions below 2^_POS_BITS — validate the
    # former at plan time, enforce the latter in-row (ADVICE r03)
    ktype = df.schema[key].dataType.simpleString()
    if ktype not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"duplicate_spans requires an integral key column; {key!r} is "
            f"{ktype} — add an integral surrogate key (e.g. "
            "monotonically_increasing_id or a zipWithIndex rank) first"
        )
    occ = _occurrences(df, text, key, k)
    pos_ok = F.col("pos") < F.lit(1 << _POS_BITS)
    packed = F.when(
        pos_ok, (F.col(key).cast("long") * (1 << _POS_BITS)) + F.col("pos")
    ).otherwise(
        F.raise_error(
            F.lit(
                f"duplicate_spans: token position >= 2^{_POS_BITS} would "
                "corrupt the packed first-occurrence order; chunk documents "
                f"below {1 << _POS_BITS} tokens first (pipeline.prep.doc_chunks)"
            )
        ).cast("long")
    )
    stats = (
        occ.groupBy("gram").agg(
            F.count("*").alias("n_occ"),
            F.min(packed).alias("first_key"),
        )
        # only duplicated grams survive into the join (tiny fraction)
        .where(F.col("n_occ") >= min_count)
    )
    dele = (
        occ.withColumn("__pk", packed)
        .join(stats, "gram")
        .where(F.col("__pk") != F.col("first_key"))
        .select(key, "pos")
    )
    # gaps-and-islands interval merge per document: a window starts a new
    # island when it begins past every previous window's end
    w_prev = (
        Window.partitionBy(key).orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.partitionBy(key).orderBy("pos")
    islands = dele.withColumn(
        "__new",
        (F.col("pos") > F.coalesce(F.max(F.col("pos") + k).over(w_prev), F.lit(-1)))
        .cast("int"),
    ).withColumn("__island", F.sum("__new").over(w_run))
    return (
        islands.groupBy(key, "__island")
        .agg(
            F.min("pos").cast("long").alias("start_tok"),
            (F.max("pos") + k).cast("long").alias("end_tok"),
        )
        .select(key, "start_tok", "end_tok")
    )


def remove_duplicate_spans(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Rewrite ``text`` with deletion spans removed (first occurrence of
    every repeated passage kept). Adds ``clean_text`` and ``n_removed_tok``.

    The spans-per-doc array is tiny (merged intervals), so the rewrite is
    a narrow array filter over the doc's own tokens after one left join.
    Tokens here are the lowercase word tokens of :func:`tokens_col` — the
    span arithmetic and the rewrite must agree on one tokenization.
    """
    spans = (
        duplicate_spans(df, text, key, k, min_count)
        .groupBy(key)
        .agg(
            F.collect_list(F.struct("start_tok", "end_tok")).alias("__spans")
        )
    )
    toks = tokens_col(text)
    out = df.join(spans, key, "left")
    covered = lambda i: F.exists(  # noqa: E731
        F.col("__spans"),
        lambda s: (i >= s["start_tok"]) & (i < s["end_tok"]),
    )
    kept = F.when(F.col("__spans").isNull(), toks).otherwise(
        F.filter(toks, lambda t, i: ~covered(i))
    )
    return (
        out.withColumn("clean_text", F.array_join(kept, " "))
        .withColumn(
            "n_removed_tok",
            (F.size(toks) - F.size(kept)).cast("long"),
        )
        .drop("__spans")
    )
