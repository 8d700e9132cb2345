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


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def test_pack_sequences_boundaries(spark):
    """Within one bucket, docs concatenate in deterministic order and a doc
    starting at prev_cum tokens lands in sequence prev_cum // budget at
    offset prev_cum % budget."""
    df = spark.createDataFrame(
        [(i, 30) for i in range(10)], ["doc_id", "n_tokens"]
    )
    out = prep.pack_sequences(
        df, budget=100, n_buckets=1, salt="t"
    ).collect()
    assert len(out) == 10
    # single bucket: replay the same md5 order + running sum in Python
    import hashlib
    def frac(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / float(1 << 32)
    order = sorted(range(10), key=lambda i: (frac(f"t:order:{i}"), i))
    prev = 0
    expected = {}
    for i in order:
        expected[i] = (prev // 100, prev % 100)
        prev += 30
    got = {r["doc_id"]: (r["seq_id"], r["seq_off"]) for r in out}
    assert got == expected
    # docs straddle boundaries (30s into 100): some offset + 30 > 100
    assert any(off + 30 > 100 for _, off in got.values())


def test_pack_sequences_deterministic_and_bucketed(spark):
    df = spark.createDataFrame(
        [(i, 10 + i % 5) for i in range(50)], ["doc_id", "n_tokens"]
    )
    a = sorted(tuple(r) for r in prep.pack_sequences(df, budget=64, n_buckets=4).collect())
    b = sorted(tuple(r) for r in prep.pack_sequences(df, budget=64, n_buckets=4).collect())
    assert a == b
    buckets = {r[1] for r in a}
    assert buckets <= set(range(4)) and len(buckets) == 4


def test_pack_sequences_sql_parity(spark):
    import duckdb
    rows = [(i, 7 + (i * 13) % 40) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = sorted(
        tuple(r) for r in prep.pack_sequences(df, budget=96, n_buckets=4).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, n_tokens BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        con.sql(prep.pack_sequences_sql("t", budget=96, n_buckets=4)).fetchall()
    )
    assert got == want


def test_pack_sequences_window_is_per_bucket(spark):
    """The running sum's window is partitioned by bucket — the physical
    plan sorts WITHIN hash partitions of bucket, never a single global
    partition."""
    df = spark.createDataFrame([(i, 5) for i in range(20)], ["doc_id", "n_tokens"])
    plan = (
        prep.pack_sequences(df, budget=10, n_buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(bucket" in plan
    assert "SinglePartition" not in plan


def test_pack_sequences_validation(spark):
    df = spark.createDataFrame([(1, 5)], ["doc_id", "n_tokens"])
    with pytest.raises(ValueError):
        prep.pack_sequences(df, budget=0)
    with pytest.raises(ValueError):
        prep.pack_sequences(df, n_buckets=0)
