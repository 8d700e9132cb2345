"""Structured Streaming incremental index maintenance."""

import os

from tantiny_spark.index import Index
from tantiny_spark.schema import IndexSchema
from tantiny_spark.streaming import incremental_index_writer


def test_incremental_stream_upserts(spark, tmp_path):
    src_dir = str(tmp_path / "incoming")
    os.makedirs(src_dir)
    chk = str(tmp_path / "chk")

    s = IndexSchema()
    s.text("t")
    idx = Index(spark, str(tmp_path / "idx"), s)

    # batch 1: two docs
    spark.createDataFrame(
        [("1", "hello world"), ("2", "goodbye world")], "id string, t string"
    ).coalesce(1).write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema("id string, t string").parquet(src_dir)
    q = incremental_index_writer(stream, idx, chk).trigger(availableNow=True).start()
    q.awaitTermination(120)
    idx.reload()
    assert sorted(idx.search("world")) == ["1", "2"]

    # batch 2: update doc 1, add doc 3 → upsert semantics
    spark.createDataFrame(
        [("1", "replaced text"), ("3", "hello again")], "id string, t string"
    ).coalesce(1).write.mode("append").parquet(src_dir)
    q = incremental_index_writer(stream, idx, chk).trigger(availableNow=True).start()
    q.awaitTermination(120)

    # snapshot isolation until reload
    assert sorted(idx.search("world")) == ["1", "2"]
    idx.reload()
    assert idx.search("world") == ["2"]
    assert idx.search("replaced") == ["1"]
    assert sorted(idx.search("hello")) == ["3"]
