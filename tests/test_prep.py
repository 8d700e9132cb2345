"""Training-prep primitives (pipeline/prep.py): deterministic hash splits
and fixed-size chunking — membership purity, fraction sanity, chunk
boundary math, and the zero-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from tantiny_spark.pipeline import prep


def test_hash_split_deterministic_and_total(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], ["doc_id"])
    a = {r["doc_id"]: r["split"] for r in prep.hash_split(df).collect()}
    b = {r["doc_id"]: r["split"] for r in prep.hash_split(df).collect()}
    assert a == b  # pure function of the key
    assert set(a.values()) <= {"train", "val", "test"}
    # 98/1/1 within loose tolerance at n=2000
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.95 <= n_train / 2000 <= 1.0


def test_hash_split_membership_survives_appends(spark):
    """Appending rows must not reassign old ones: split of doc i computed
    alone equals its split computed in a larger table."""
    small = spark.createDataFrame([(7,), (13,)], ["doc_id"])
    big = spark.createDataFrame([(i,) for i in range(100)], ["doc_id"])
    got_small = {r["doc_id"]: r["split"] for r in prep.hash_split(small).collect()}
    got_big = {r["doc_id"]: r["split"] for r in prep.hash_split(big).collect()}
    assert got_small == {k: got_big[k] for k in got_small}


def test_hash_split_salt_decorrelates(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], ["doc_id"])
    half = {"a": 0.5, "b": 0.5}
    s1 = {r["doc_id"]: r["split"]
          for r in prep.hash_split(df, splits=half, salt="s1").collect()}
    s2 = {r["doc_id"]: r["split"]
          for r in prep.hash_split(df, splits=half, salt="s2").collect()}
    agree = sum(1 for k in s1 if s1[k] == s2[k])
    assert 0.3 < agree / 500 < 0.7  # independent coin flips, not identical


def test_hash_split_validates_fractions(spark):
    df = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError):
        prep.hash_split(df, splits={"a": 0.5, "b": 0.2})


def test_chunk_boundaries_disjoint(spark):
    words = " ".join(f"w{i}" for i in range(11))
    df = spark.createDataFrame([(1, words), (2, ""), (3, "solo")],
                               ["doc_id", "text"])
    out = prep.chunk_documents(df, max_words=4).collect()
    got = {(r["doc_id"], r["chunk_id"]): (r["n_words"], r["chunk_text"])
           for r in out}
    assert got[(1, 0)] == (4, "w0 w1 w2 w3")
    assert got[(1, 1)] == (4, "w4 w5 w6 w7")
    assert got[(1, 2)] == (3, "w8 w9 w10")  # ragged tail kept
    assert got[(3, 0)] == (1, "solo")
    assert not any(d == 2 for d, _ in got)  # empty doc → no rows


def test_chunk_overlapping_stride(spark):
    words = " ".join(f"w{i}" for i in range(6))
    df = spark.createDataFrame([(1, words)], ["doc_id", "text"])
    out = prep.chunk_documents(df, max_words=4, stride=2).collect()
    texts = [r["chunk_text"] for r in sorted(out, key=lambda r: r["chunk_id"])]
    assert texts == ["w0 w1 w2 w3", "w2 w3 w4 w5"]


def test_chunk_exact_multiple_no_empty_tail(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    out = prep.chunk_documents(df, max_words=2).collect()
    assert sorted(r["chunk_text"] for r in out) == ["a b", "c d"]


def test_prep_plans_have_no_shuffle(spark):
    """Both operators are narrow per-row transforms: no Exchange, no
    Python node anywhere in the physical plan."""
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    for out in (prep.hash_split(df), prep.chunk_documents(df, max_words=2)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "PythonUDF" not in plan and "EvalPython" not in plan
