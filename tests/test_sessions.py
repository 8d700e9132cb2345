"""Gap-based sessionization: batch session_window rollup + the streaming
form (append-mode finalization past the watermark)."""

import datetime as dt
import os


def _t(minute, second=0):
    return dt.datetime(2026, 1, 1, 10, 0, 0) + dt.timedelta(
        minutes=minute, seconds=second
    )


def test_sessionize_batch_gap_semantics(spark):
    from tantiny_spark.pipeline.sessions import sessionize

    rows = [
        # user 1: two events 10 min apart (one session), then an event
        # strictly PAST the 30-min boundary — a new session (an event AT
        # the boundary would merge; covered in the next test)
        (1, _t(0), 1.0),
        (1, _t(10), 2.0),
        (1, _t(40, 1), 4.0),  # 10:10 + 30min = 10:40; 10:40:01 > boundary
        # user 2: single event
        (2, _t(5), 8.0),
        # null user dropped
        (None, _t(0), 99.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sessionize(df, gap="30 minutes").collect()
    by = {(r["user_id"], r["session_start_us"]): r for r in out}
    us = lambda m, s=0: int(_t(m, s).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)  # noqa: E731
    assert len(out) == 3
    s1 = by[(1, us(0))]
    assert s1["n_events"] == 2 and s1["sum_value"] == 3.0
    assert s1["session_end_us"] == us(40)  # last event 10:10 + 30 min
    s2 = by[(1, us(40, 1))]
    assert s2["n_events"] == 1 and s2["session_end_us"] == us(70, 1)
    assert by[(2, us(5))]["n_events"] == 1


def test_sessionize_event_inside_gap_merges(spark):
    from tantiny_spark.pipeline.sessions import sessionize

    rows = [(1, _t(0), 1.0), (1, _t(30), 2.0), (1, _t(59), 4.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sessionize(df, gap="30 minutes").collect()
    # the 10:30 event touches the [10:00, 10:30] window exactly — Spark
    # merges on touch, so ONE session spans all three (chained)
    assert len(out) == 1 and out[0]["n_events"] == 3


def test_streaming_sessions_finalize_past_watermark(spark, tmp_path):
    from tantiny_spark.pipeline.sessions import streaming_sessions

    src = str(tmp_path / "ev")
    os.makedirs(src)
    schema = "user_id long, ts timestamp, value double"
    spark.createDataFrame(
        [
            (1, _t(0), 1.0), (1, _t(10), 2.0),
            # push the watermark (1h) far past 10:40 so user 1's session
            # finalizes: max ts 14:00 -> watermark 13:00 > 10:40
            (9, dt.datetime(2026, 1, 1, 14, 0), 0.5),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_sessions(stream, gap="30 minutes", watermark="1 hour")
    q = (
        out.writeStream.format("memory").queryName("sess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM sess").collect()
    got = {r["user_id"]: r for r in rows}
    # user 1's session emitted closed; user 9's is still open (not emitted)
    assert 1 in got and got[1]["n_events"] == 2 and got[1]["sum_value"] == 3.0
    assert 9 not in got


def test_sessionize_matches_batch_and_streaming(spark, tmp_path):
    """Backfill/live parity: the same events produce the same finalized
    sessions through both forms."""
    from tantiny_spark.pipeline.sessions import sessionize, streaming_sessions

    rows = [
        (u, _t(m), float(u + m))
        for u in (1, 2, 3)
        for m in (0, 7, 45, 50)
    ] + [(9, dt.datetime(2026, 1, 1, 15, 0), 0.0)]
    schema = "user_id long, ts timestamp, value double"
    src = str(tmp_path / "ev2")
    os.makedirs(src)
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("append").parquet(src)

    batch = {
        tuple(r) for r in sessionize(df, gap="30 minutes").collect()
        if r["user_id"] != 9
    }
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_sessions(stream, gap="30 minutes", watermark="1 hour")
    q = (
        out.writeStream.format("memory").queryName("sess2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {tuple(r) for r in spark.sql("SELECT * FROM sess2").collect()}
    assert streamed == batch
