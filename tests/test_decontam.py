"""Benchmark decontamination (pipeline/decontam.py): n-gram overlap
flagging, normalization parity, the drop composition, and the plan shape
(corpus grams must not shuffle before the benchmark join)."""

import pytest
from pyspark.sql import functions as F

from tantiny_spark.pipeline import decontam


def _flags(spark, corpus_rows, bench_rows, n):
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    bench = spark.createDataFrame([(t,) for t in bench_rows], ["text"])
    out = decontam.flag_contaminated(
        corpus, decontam.benchmark_grams(bench, n=n), n=n
    )
    return {r["doc_id"]: (r["n_contaminated_grams"], r["contaminated"])
            for r in out.collect()}


def test_overlap_flags_and_counts(spark):
    corpus = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "completely unrelated text about spark physical plans here"),
        (2, "prefix words then the quick brown fox appears again"),
    ]
    bench = ["The QUICK brown fox!", "lazy dog tonight"]
    got = _flags(spark, corpus, bench, n=4)
    # doc 0 contains both benchmark 4-grams (case/punct-normalized)
    assert got[0] == (1, True) or got[0][1] is True
    assert got[1] == (0, False)
    assert got[2][1] is True


def test_distinct_gram_counting(spark):
    """A benchmark gram repeated inside one doc counts ONCE (distinct)."""
    corpus = [(0, "a b c d a b c d a b c d")]
    got = _flags(spark, corpus, ["a b c d"], n=4)
    assert got[0] == (1, True)


def test_short_docs_have_no_grams(spark):
    corpus = [(0, "one two three")]
    got = _flags(spark, corpus, ["one two three four"], n=4)
    assert got[0] == (0, False)


def test_normalization_matches_both_sides(spark):
    """Case, punctuation and unicode whitespace differences must not hide
    contamination: both sides normalize identically."""
    corpus = [(0, "Alpha,BETA;gamma  DELTA!")]
    got = _flags(spark, corpus, ["alpha beta GAMMA delta"], n=4)
    assert got[0] == (1, True)


def test_drop_contaminated_keeps_clean_rows(spark):
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps high", "keep-meta-0"),
            (1, "totally clean document body words", "keep-meta-1"),
        ],
        ["doc_id", "text", "meta"],
    )
    bench = spark.createDataFrame([("quick brown fox jumps",)], ["text"])
    out = decontam.drop_contaminated(corpus, bench, n=4)
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["meta"] == "keep-meta-1"  # original columns survive


def test_every_doc_reported_once(spark):
    corpus = [(i, f"w{i} filler words here") for i in range(20)]
    got = _flags(spark, corpus, ["no overlap at all"], n=4)
    assert len(got) == 20 and all(v == (0, False) for v in got.values())


def test_corpus_grams_join_is_broadcastable(spark):
    """The contamination join must be broadcast-eligible: the benchmark
    side's size is only known at runtime (post-explode, post-distinct), so
    the STATIC plan is a sort-merge join and AQE converts it to broadcast
    once the small size materializes — execute, then assert on the FINAL
    adaptive plan, which is exactly what a 1000-executor run would do."""
    corpus = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(50)],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([("alpha beta gamma delta",)], ["text"])
    out = decontam.flag_contaminated(
        corpus, decontam.benchmark_grams(bench, n=4), n=4
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
