"""Benchmark decontamination: flag training documents that share any word
n-gram with an evaluation/benchmark set.

This is the published training-corpus hygiene step (GPT-3 appendix C and
successors use 13-gram overlap): a document that contains any n-gram that
also appears in a held-out benchmark is "contaminated" and must be dropped
(or audited) before training, otherwise eval scores measure memorization.

Scale shape (the part that matters at 100 TB):

- The benchmark side is SMALL relative to the corpus (benchmarks are
  thousands to millions of grams, the corpus is billions of documents).
  ``benchmark_grams`` distincts it once; the contamination join is
  therefore broadcast-eligible — AQE broadcasts it and the corpus-side
  gram stream NEVER shuffles. No forced ``broadcast()`` hint: if someone
  feeds a corpus-sized "benchmark", the join degrades to a shuffle join
  instead of OOMing the driver.
- The corpus side is a narrow projection + explode (no shuffle), and only
  MATCHED (doc, gram) pairs — a tiny fraction — reach the per-doc count
  aggregation, which is itself partial-aggregatable.
- Gram normalization (lowercase, alnum-run word split) is pure JVM
  codegen: `split` / `transform` / `slice` / `array_join`; no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Published overlap width: GPT-3's decontamination used 13-gram matches.
DEFAULT_N = 13

_WORD_SPLIT = "[^0-9a-z]+"


def normalized_words(col: Column | str) -> Column:
    """Lowercased words split on non-alphanumeric runs, empties dropped.

    The same normalization both sides of the overlap use, so formatting
    differences (case, punctuation, whitespace) don't hide contamination.
    """
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    return F.filter(F.split(F.lower(c), _WORD_SPLIT), lambda w: w != "")


def word_ngrams(words: Column, n: int = DEFAULT_N) -> Column:
    """Array of space-joined word n-grams of ``words`` (empty if < n words)."""
    idx = F.sequence(F.lit(0), F.size(words) - n)
    return F.when(
        F.size(words) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def benchmark_grams(
    bench: DataFrame, text: str = "text", n: int = DEFAULT_N
) -> DataFrame:
    """Distinct word n-grams of a benchmark table → one column ``g``.

    Distinct once here so the per-corpus join key set is minimal (and so
    repeated benchmark rows don't inflate match counts).
    """
    return (
        bench.select(F.explode(word_ngrams(normalized_words(text), n)).alias("g"))
        .distinct()
    )


def flag_contaminated(
    corpus: DataFrame,
    bench_grams: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = DEFAULT_N,
) -> DataFrame:
    """Per-document contamination flags against a benchmark gram set.

    Returns the corpus ``id_col`` plus:

    - ``n_contaminated_grams``: distinct benchmark n-grams found in the doc
      (distinct, so a gram repeated inside one doc counts once — the
      audit-relevant number is "how many benchmark items leak", not "how
      often").
    - ``contaminated``: any overlap at all.

    ``bench_grams`` is the output of :func:`benchmark_grams` (one ``g``
    column). Plan shape: corpus explode → left-semi join on ``g``
    (broadcast-eligible right side) → partial-aggregatable per-doc count →
    left join back onto the id spine so clean docs report 0 / false.
    """
    grams = corpus.select(
        F.col(id_col),
        F.explode(word_ngrams(normalized_words(text), n)).alias("g"),
    )
    hits = (
        grams.join(bench_grams, "g", "left_semi")
        .groupBy(id_col)
        .agg(F.count_distinct("g").alias("n_contaminated_grams"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_contaminated_grams", F.lit(0))
            .cast("long")
            .alias("n_contaminated_grams"),
            (F.coalesce("n_contaminated_grams", F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def drop_contaminated(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    bench_text: str = "text",
    n: int = DEFAULT_N,
) -> DataFrame:
    """Corpus minus contaminated documents (all original columns kept).

    The convenience composition a training pipeline calls: build the
    benchmark gram set, flag, keep the clean rows.
    """
    flags = flag_contaminated(
        corpus, benchmark_grams(bench, bench_text, n), id_col, text, n
    )
    clean = flags.where(~F.col("contaminated")).select(id_col)
    return corpus.join(clean, id_col, "left_semi")
