"""Gap-based sessionization over event streams.

Spark-first: the engine's native ``session_window`` grouping expression
(SPARK-10816, public DataFrame API) does the merge-on-overlap session
assignment inside ONE partial-aggregatable groupBy — no per-user window
function, no custom state. The same expression works in batch (this
module's contract surface) and Structured Streaming (with a watermark,
see :func:`streaming_sessions`), so backfill and live ingest share one
definition of "session".

Semantics (Spark's, replayed by the DuckDB oracle in __spark_entry__):
per-event windows [t, t+gap] merge when they overlap OR touch, so an
event at exactly ``last_event_ts + gap`` still EXTENDS the session; only
an event strictly past that boundary starts a new one (verified against
session_window directly in tests/test_sessions.py).
``session_window.end`` is ``last_event_ts + gap`` (not the last event
time) — kept as-is because that is the public API's contract.

Scale shape: groupBy(user, session_window) shuffles by user with
map-side partial session merging — state per task is O(open sessions in
the partition), and the key space (users) is high-cardinality and
near-uniform, the best case for a 1000-executor shuffle. Timestamps are
emitted as epoch microseconds (BIGINT) so cross-engine comparison is
type-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    value: str | None = "value",
) -> DataFrame:
    """Per-(key, session) rollup of an event table: session bounds, event
    count and (optionally) a value sum. Returns
    (key, session_start_us, session_end_us, n_events[, sum_value])
    with session_end_us = last event + gap (the session_window contract).
    Rows with a null key or timestamp are dropped (no null session)."""
    base = df.where(F.col(key).isNotNull() & F.col(ts).isNotNull())
    aggs = [F.count(F.lit(1)).cast("long").alias("n_events")]
    if value is not None:
        aggs.append(F.round(F.sum(value), 4).alias("sum_value"))
    return (
        base.groupBy(key, F.session_window(ts, gap).alias("__sw"))
        .agg(*aggs)
        .select(
            key,
            # cast: parquet TIMESTAMP_NTZ columns (session-tz UTC — the
            # repo-wide convention) and TIMESTAMP both land on epoch µs
            F.unix_micros(F.col("__sw.start").cast("timestamp"))
            .alias("session_start_us"),
            F.unix_micros(F.col("__sw.end").cast("timestamp"))
            .alias("session_end_us"),
            "n_events",
            *(["sum_value"] if value is not None else []),
        )
    )


def streaming_sessions(
    stream: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value: str | None = "value",
) -> DataFrame:
    """Streaming form of :func:`sessionize`: identical grouping expression
    over a watermarked stream. A session finalizes (append mode) once the
    watermark passes its end; state per key is dropped then — bounded by
    the open-session count inside the watermark horizon, never the
    corpus. Late events inside the watermark still merge/extend their
    session; later ones are dropped (the standard late-data contract,
    same as streaming_ops.windowed_doc_counts)."""
    return sessionize(
        stream.withWatermark(ts, watermark), key=key, ts=ts, gap=gap,
        value=value,
    )
