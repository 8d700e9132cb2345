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


def test_merge_uses_latest_committed_version_not_reader_snapshot(spark, tmp_path):
    """Regression: merge_segments must compact the latest COMMITTED
    manifest — a merge issued while the reader snapshot is stale (commits
    since the last reload) must not drop those commits."""
    s = IndexSchema()
    s.text("t")
    idx = Index(spark, str(tmp_path / "idxstale"), s)
    idx.add({"id": 1, "t": "alpha one"})
    idx.reload()  # reader snapshot sees only doc 1
    idx.add({"id": 2, "t": "alpha two"})  # committed, NOT reloaded
    idx.merge_segments()
    idx.reload()
    assert sorted(idx.search("alpha")) == ["1", "2"]
    assert idx.segment_count() == 1


def test_streaming_auto_merge_policy(spark, tmp_path):
    src_dir = str(tmp_path / "in2")
    os.makedirs(src_dir)
    chk = str(tmp_path / "chk2")
    s = IndexSchema()
    s.text("t")
    idx = Index(spark, str(tmp_path / "idx2"), s)

    stream = spark.readStream.schema("id string, t string").parquet(src_dir)
    # three epochs with max_segments=2: the third commit trips the policy
    for i in range(3):
        spark.createDataFrame(
            [(str(i), f"alpha doc{i}")], "id string, t string"
        ).coalesce(1).write.mode("append").parquet(src_dir)
        q = incremental_index_writer(
            stream, idx, chk, max_segments=2
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)
    idx.reload()
    assert idx.segment_count() <= 2
    assert sorted(idx.search("alpha")) == ["0", "1", "2"]


def test_merge_respects_writer_lock(spark, tmp_path):
    from tantiny_spark.errors import IndexWriterBusyError
    import pytest

    s = IndexSchema()
    s.text("t")
    path = str(tmp_path / "idxlock")
    idx = Index(spark, path, s)
    idx.add({"id": 1, "t": "alpha"})
    writer = Index(spark, path, exclusive_writer=True)
    try:
        with pytest.raises(IndexWriterBusyError):
            idx.merge_segments()
    finally:
        writer.close()


def test_streaming_tombstones_never_materialize_on_driver(spark, tmp_path, monkeypatch):
    """The streaming upsert path must commit its delete set as a parquet
    tombstone side-table — never as collected Python ids (a 100 TB
    availableNow backfill is ONE batch) and never inlined in the manifest
    JSON. DataFrame.collect is poisoned for the duration of the batch to
    prove no id list ever crosses to the driver."""
    import json
    from pyspark.sql import DataFrame

    src_dir = str(tmp_path / "in3")
    os.makedirs(src_dir)
    chk = str(tmp_path / "chk3")
    s = IndexSchema()
    s.text("t")
    idx = Index(spark, str(tmp_path / "idx3"), s)

    spark.createDataFrame(
        [("1", "alpha one"), ("2", "alpha two")], "id string, t string"
    ).coalesce(1).write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema("id string, t string").parquet(src_dir)

    real_collect = DataFrame.collect

    def poisoned(self, *a, **k):
        raise AssertionError("streaming commit collected rows onto the driver")

    monkeypatch.setattr(DataFrame, "collect", poisoned)
    try:
        q = incremental_index_writer(stream, idx, chk).trigger(
            availableNow=True
        ).start()
        q.awaitTermination(120)
        exc = q.exception()
        assert exc is None, f"streaming batch failed: {exc}"
    finally:
        monkeypatch.setattr(DataFrame, "collect", real_collect)

    # the manifest references a tombstone table by name; no inline ids
    manifest = idx.storage.read_manifest(idx.storage.current_version())
    seg = manifest["segments"][-1]
    assert seg["tombstones"] == []
    assert seg.get("tombstone_table")
    ts = idx.storage.read_tombstone_table(spark, seg["tombstone_table"])
    assert sorted(r["id"] for r in ts.collect()) == ["1", "2"]

    # and the read path applies table-backed tombstones on upsert
    spark.createDataFrame(
        [("1", "replaced text")], "id string, t string"
    ).coalesce(1).write.mode("append").parquet(src_dir)
    q = incremental_index_writer(stream, idx, chk).trigger(availableNow=True).start()
    q.awaitTermination(120)
    idx.reload()
    assert idx.search("alpha") == ["2"]
    assert idx.search("replaced") == ["1"]


def test_streaming_commit_holds_writer_lock(spark, tmp_path):
    """r04 ADVICE #2: the foreachBatch commit must serialize through the
    same writer lock merges take — an exclusive writer elsewhere makes the
    streaming batch fail loudly instead of silently interleaving."""
    from tantiny_spark.errors import IndexWriterBusyError

    src_dir = str(tmp_path / "in4")
    os.makedirs(src_dir)
    s = IndexSchema()
    s.text("t")
    path = str(tmp_path / "idx4")
    idx = Index(spark, path, s)
    idx.add({"id": "0", "t": "seed"})  # persist the schema first
    spark.createDataFrame(
        [("1", "alpha")], "id string, t string"
    ).coalesce(1).write.mode("append").parquet(src_dir)

    other = Index(spark, path, exclusive_writer=True)
    try:
        from tantiny_spark.streaming import foreach_batch_upsert
        import pytest

        batch = spark.read.parquet(src_dir)
        with pytest.raises(IndexWriterBusyError):
            foreach_batch_upsert(idx)(batch, 0)
    finally:
        other.close()


def test_merge_telemetry_numbers(spark, tmp_path):
    """maybe_merge records what the compaction rewrote — the numbers
    behind the merge policy's read-amplification bound."""
    s = IndexSchema()
    s.text("t")
    idx = Index(spark, str(tmp_path / "idxtel"), s)
    for i in range(3):
        idx.add({"id": str(i), "t": f"alpha doc{i}"})
    idx.delete("2")
    idx.reload()
    assert idx.last_merge_stats is None
    assert idx.maybe_merge(max_segments=2) is not None
    st = idx.last_merge_stats
    assert st["segments_before"] == 3
    assert st["segments_after"] == 1
    assert st["tombstone_entries_dropped"] >= 1  # upserts + the delete
    assert st["live_docs_rewritten"] == 2  # doc 2 tombstoned, not rewritten
    idx.reload()
    assert sorted(idx.search("alpha")) == ["0", "1"]
