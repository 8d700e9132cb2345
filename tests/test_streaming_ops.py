"""Streaming pipeline operators: watermarked window agg + stateful dedup."""

import datetime as dt
import os

import pandas as pd


def _write_batch(spark, src_dir, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
        src_dir
    )


def _run_available_now(stream_out, tmp_path, name):
    q = (
        stream_out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"chk_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _run_available_now_parquet(stream_out, tmp_path, name):
    """File sink (supports checkpoint RECOVERY, unlike the memory sink) —
    for tests that restart the same query over new source batches."""
    out_dir = str(tmp_path / f"out_{name}")
    q = (
        stream_out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / f"chk_{name}"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return out_dir


def test_windowed_doc_counts_with_late_data(spark, tmp_path):
    from tantiny_spark.streaming_ops import windowed_doc_counts

    src = str(tmp_path / "ev")
    os.makedirs(src)
    schema = "doc_id long, ts timestamp, lang string"
    t = dt.datetime(2026, 1, 1, 10, 0, 0)

    _write_batch(
        spark, src,
        [
            (1, t, "en"), (2, t + dt.timedelta(minutes=10), "en"),
            (3, t + dt.timedelta(minutes=70), "de"),
        ],
        schema,
    )
    # batch 2: a LATE row inside the watermark for the 10:00 window, plus a
    # row far enough ahead to push the watermark past 11:00 and finalize
    # both earlier windows
    _write_batch(
        spark, src,
        [
            (4, t + dt.timedelta(minutes=30), "en"),  # late, within watermark
            (5, t + dt.timedelta(hours=4), "en"),     # advances the watermark
        ],
        schema,
    )

    stream = spark.readStream.schema(schema).parquet(src)
    out = windowed_doc_counts(
        stream, ts_col="ts", window="1 hour", watermark="2 hours",
        extra_keys=("lang",),
    )
    _run_available_now(out, tmp_path, "wincounts")

    got = {
        (r["window_start"].isoformat(), r["lang"]): r["n_docs"]
        for r in spark.sql("SELECT * FROM wincounts").collect()
    }
    # the late doc 4 still landed in the 10:00 window
    assert got[("2026-01-01T10:00:00", "en")] == 3
    assert got[("2026-01-01T11:00:00", "de")] == 1


def test_streaming_dedup_first_seen_only(spark, tmp_path):
    from tantiny_spark.streaming_ops import streaming_dedup

    src = str(tmp_path / "docs")
    os.makedirs(src)
    schema = "doc_id long, text string"

    _write_batch(
        spark, src,
        [(1, "the quick brown fox"), (2, "something else"), (3, "The  quick BROWN fox")],
        schema,
    )
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_dedup(stream)
    out_dir = _run_available_now_parquet(out, tmp_path, "dedup1")
    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    # doc 3 normalizes to doc 1's fingerprint → dropped
    assert got == {1, 2}

    # batch 2 after a query RESTART from the checkpoint: a repeat of doc 1's
    # content and one new doc — state persists in the state store, so only
    # the new doc is emitted
    _write_batch(
        spark, src, [(4, "the quick brown fox"), (5, "fresh content")], schema
    )
    _run_available_now_parquet(out, tmp_path, "dedup1")
    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {1, 2, 5}


def test_streaming_dedup_batch_parity(spark, tmp_path):
    """The streaming fingerprint matches the batch exact-dedup fingerprint,
    so batch backfill + streaming tail agree on what is a duplicate."""
    from pyspark.sql import functions as F

    from tantiny_spark.pipeline.dedup import exact_duplicates
    from tantiny_spark.streaming_ops import content_fingerprint

    df = spark.createDataFrame(
        [(1, "A  b C"), (2, "a b c"), (3, "other")], "doc_id long, text string"
    )
    batch_fps = {
        r["fingerprint"]
        for r in exact_duplicates(df).select("fingerprint").collect()
    }
    stream_fps = {
        r["fp"]
        for r in df.select(content_fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert stream_fps == batch_fps


def test_streaming_dedup_state_ttl_expires(spark, tmp_path):
    """With ts_col + state_ttl, per-fingerprint state is dropped via
    EventTimeTimeout once the watermark passes last-seen + ttl — bounded
    state for an unbounded crawl: a re-crawl far beyond the horizon counts
    as fresh and is emitted again."""
    from tantiny_spark.streaming_ops import streaming_dedup

    src = str(tmp_path / "docs")
    os.makedirs(src)
    schema = "doc_id long, ts timestamp, text string"
    t = dt.datetime(2026, 1, 1, 10, 0, 0)

    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_dedup(stream, ts_col="ts", state_ttl="1 hour")

    # batch 1: first sighting of the content
    _write_batch(spark, src, [(1, t, "same page body")], schema)
    out_dir = _run_available_now_parquet(out, tmp_path, "ttl")
    # batch 2: advance the watermark far past 11:00 (= last seen + ttl)
    _write_batch(
        spark, src, [(2, t + dt.timedelta(hours=6), "unrelated")], schema
    )
    _run_available_now_parquet(out, tmp_path, "ttl")
    # batch 3: no data for the fingerprint → its timed-out state is removed
    _write_batch(
        spark, src, [(3, t + dt.timedelta(hours=7), "also unrelated")], schema
    )
    _run_available_now_parquet(out, tmp_path, "ttl")
    # batch 4: the same content re-crawled well past the horizon → fresh
    _write_batch(
        spark, src, [(4, t + dt.timedelta(hours=8), "same page body")], schema
    )
    _run_available_now_parquet(out, tmp_path, "ttl")

    got = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert 1 in got and 4 in got  # both sightings emitted: state expired
