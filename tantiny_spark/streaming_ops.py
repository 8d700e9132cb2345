"""Streaming training-data-pipeline operators.

Two Structured-Streaming counterparts to the batch pipeline ops, built the
way a 1000-executor continuous crawl-ingest job would run them:

- ``windowed_doc_counts``: watermarked tumbling-window aggregation (the
  streaming analog of the batch ``events_hourly`` rollup). Late rows inside
  the watermark still land in their window; rows later than the watermark
  are dropped and their window finalized — bounded state, the standard
  late-data contract.

- ``streaming_dedup``: stateful exact dedup over a document stream via
  ``applyInPandasWithState`` — the custom-stateful-operator escape hatch
  the DataFrame API can't express (dropDuplicates on a stream keeps state
  forever and re-emits nothing, but gives no control over the state key,
  TTL, or what is emitted). State is keyed by content fingerprint; only
  the FIRST document ever seen for a fingerprint is emitted. With an
  event-time watermark on the input, per-key state is dropped via
  EventTimeTimeout once the key falls behind the watermark, so state size
  is bounded by the distinct-fingerprint rate inside the watermark horizon
  rather than growing with the whole corpus — at web scale an unbounded
  seen-set is an OOM, and near-horizon re-crawls are exactly the dupes
  worth catching.

The fingerprint itself matches ``dedup.exact_duplicates``: md5 of the
whitespace-normalized lowercased text, so batch and streaming dedup agree
on what "identical content" means.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def content_fingerprint(text_col):
    """Same normalization as dedup.exact_duplicates: md5 over
    lowercased, whitespace-collapsed, trimmed text."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")))


def windowed_doc_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    extra_keys: tuple = (),
) -> DataFrame:
    """Tumbling-window doc counts with a late-data watermark.

    Output: (window_start, window_end, *extra_keys, n_docs). Append-mode
    sinks emit each window once, when the watermark passes its end — the
    streaming analog of the batch events_hourly rollup, with state bounded
    by windows inside the watermark horizon."""
    keys = [F.window(F.col(ts_col), window).alias("w"), *[F.col(k) for k in extra_keys]]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *[F.col(k) for k in extra_keys],
            "n_docs",
        )
    )


_DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.IntegerType())])


def streaming_dedup(
    stream: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    ts_col: str | None = None,
    state_ttl: str | None = None,
) -> DataFrame:
    """First-seen filter over a document stream, state keyed by content
    fingerprint. Emits (fingerprint, doc_id) for each fingerprint's first
    document; later identical documents are dropped.

    With ``ts_col`` + ``state_ttl`` (requires a watermark upstream or sets
    one here), per-fingerprint state expires via EventTimeTimeout once the
    watermark passes last-seen + ttl — bounded state for an unbounded
    crawl. Without them state is kept forever (only safe for bounded
    backfills)."""
    out_schema = T.StructType(
        [
            T.StructField("fingerprint", T.StringType()),
            T.StructField(key, stream.schema[key].dataType),
        ]
    )

    def first_seen(
        fp_key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last-seen + ttl: drop the seen-marker; a
            # far-future re-crawl of this content counts as fresh
            state.remove()
            return
        first_row = None
        max_ts = None
        for pdf in batches:
            if first_row is None and len(pdf):
                first_row = pdf.iloc[0]
            if ts_col is not None and len(pdf):
                # dropna: a null event time must not poison the max (NaT
                # compares False against everything, so it would stick) or
                # reach setTimeoutTimestamp as a huge negative ms value and
                # kill the whole streaming query over one bad row
                m = pdf[ts_col].dropna().max()
                if pd.notna(m):
                    max_ts = m if max_ts is None else max(max_ts, m)
        fresh = not state.exists
        state.update((1,))
        if ts_col is not None and max_ts is not None:
            ttl_ms = int(pd.Timedelta(state_ttl or "1 hour").value // 10**6)
            state.setTimeoutTimestamp(
                int(pd.Timestamp(max_ts).value // 10**6) + ttl_ms
            )
        if fresh and first_row is not None:
            yield pd.DataFrame(
                {"fingerprint": [fp_key[0]], key: [first_row[key]]}
            )

    with_fp = stream.withColumn("fingerprint", content_fingerprint(F.col(text)))
    if ts_col is not None:
        with_fp = with_fp.withWatermark(ts_col, state_ttl or "1 hour")
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    return with_fp.groupBy("fingerprint").applyInPandasWithState(
        first_seen, out_schema, _DEDUP_STATE_SCHEMA, "append", timeout
    )
