"""Repeated token-span detection/removal (ExactSubstr-style dedup)."""

import pytest

from tantiny_spark.pipeline import spans


def _spans(df, **kw):
    return {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in spans.duplicate_spans(df, k=kw.pop("k", 3), **kw).collect()
    }


def test_repeated_passage_marked_except_first(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one"),
            (2, "junk alpha beta gamma delta more junk2"),
        ],
        ["doc_id", "text"],
    )
    # k=3: windows of "alpha beta gamma delta" repeat in doc 2 at pos 1,2
    # -> merged deletion span [1, 5); doc 1 (first occurrence) untouched
    assert _spans(df) == {(2, 1, 5)}


def test_no_duplicates_no_spans(spark):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, "four five six")], ["doc_id", "text"]
    )
    assert _spans(df) == set()


def test_intra_document_repeat(spark):
    df = spark.createDataFrame(
        [(1, "x y z pad1 pad2 x y z")], ["doc_id", "text"]
    )
    # second "x y z" (pos 5) duplicates the first (pos 0)
    assert _spans(df) == {(1, 5, 8)}


def test_disjoint_repeats_yield_separate_spans(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c stop d e f"),
            (2, "a b c gap1 gap2 gap3 gap4 d e f"),
        ],
        ["doc_id", "text"],
    )
    assert _spans(df) == {(2, 0, 3), (2, 7, 10)}


def test_remove_rewrites_text_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma tail"),
            (2, "head alpha beta gamma"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed_tok"])
        for r in spans.remove_duplicate_spans(df, k=3).collect()
    }
    assert got[1] == ("alpha beta gamma tail", 0)
    assert got[2] == ("head", 3)


def test_min_count_threshold(spark):
    df = spark.createDataFrame(
        [(1, "p q r"), (2, "p q r"), (3, "p q r")], ["doc_id", "text"]
    )
    # min_count=4 > 3 occurrences -> nothing flagged
    assert _spans(df, min_count=4) == set()
    # default: docs 2 and 3 flagged, doc 1 kept
    assert _spans(df) == {(2, 0, 3), (3, 0, 3)}


def test_short_docs_skipped(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b")], ["doc_id", "text"])
    assert _spans(df) == set()  # shorter than k -> no windows


def test_string_key_rejected(spark):
    """A non-integral key casts to NULL inside the packed first-occurrence
    BIGINT and would silently report zero spans — it must raise instead
    (ADVICE r03)."""
    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z")], ["doc_id", "text"]
    )
    with pytest.raises(TypeError, match="integral key"):
        spans.duplicate_spans(df, k=3)


def test_huge_position_fails_loud(spark, monkeypatch):
    """Token positions >= 2^_POS_BITS would corrupt the packed order; the
    packing raises in-row rather than silently mis-picking first
    occurrences. _POS_BITS is shrunk so the guard fires on a small doc —
    the production 2^20 path is identical code."""
    monkeypatch.setattr(spans, "_POS_BITS", 4)
    text = " ".join(f"w{i % 3}" for i in range(20))  # positions up to 17 >= 2^4
    df = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    with pytest.raises(Exception, match="2\\^4|corrupt"):
        spans.duplicate_spans(df, k=3).collect()
    # below the cap the same data shape still works
    monkeypatch.setattr(spans, "_POS_BITS", 20)
    assert spans.duplicate_spans(df, k=3).count() > 0
