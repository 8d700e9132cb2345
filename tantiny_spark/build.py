"""Distributed inverted-index build — the write path.

The Spark-native equivalent of the reference's write pipeline
(lib/tantiny/index.rb:67-79 → src/index.rs:123-188): coerce fields per schema,
tokenize, and build the four index tables for one *segment*:

- ``docs``      doc_id, id, fast-field columns, facet ancestor arrays, and a
                1-byte quantized fieldnorm per text field
- ``postings``  (field, term, doc_id, tf, positions, norm_id), sorted by
                (field, term, doc_id) so Parquet row-group min/max stats prune
                term lookups — the columnar stand-in for Tantivy's posting
                lists + fieldnorm file
- ``dict``      (field, term, df) — the term dictionary
- ``stats``     (field, num_docs, total_tokens, avgdl) — BM25 global stats

Scale notes (the 100 TB story):
- doc_id assignment is a deterministic global rank of ``id`` computed with
  repartitionByRange + per-partition offsets — never
  monotonically_increasing_id (which is partition-layout-dependent and would
  break resume + rank identity).
- the tf/positions aggregation keys on (field, term, doc_id) — high
  cardinality, so Zipfian head terms do NOT concentrate on one reducer; the
  dictionary count uses map-side partial aggregation. The only per-term
  grouping (block encoding, wand.py) buckets by doc_id span, which bounds any
  group at SPAN docs regardless of term frequency — skew-proof by
  construction.
- all per-row work is Arrow-batched pandas UDFs; everything else is built-in
  JVM expressions inside whole-stage codegen.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from tantiny_spark import scoring
from tantiny_spark.analysis.udfs import analyzed_udf
from tantiny_spark.schema import IndexSchema

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), True),
        T.StructField("norm_id", T.IntegerType(), True),
    ]
)


def fieldnorm_id_udf():
    """Vectorized token-count → fieldnorm byte id (scoring.FIELDNORM_TABLE)."""
    table = np.asarray(scoring.FIELDNORM_TABLE, dtype=np.int64)

    def _encode(lengths: pd.Series) -> pd.Series:
        vals = lengths.fillna(0).to_numpy(dtype=np.int64)
        ids = np.searchsorted(table, vals, side="right") - 1
        return pd.Series(np.clip(ids, 0, 255).astype("int32"))

    return F.pandas_udf(_encode, T.IntegerType())


def assign_doc_ids(
    df: DataFrame, order_col: str = "id", doc_id_base: int = 0,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Deterministic, parallelism-invariant doc_id = doc_id_base + global rank
    of ``order_col``.

    Two-pass pattern that scales to arbitrarily many partitions: range-
    repartition + sort by the key, count rows per partition (small driver
    collect: one long per partition), then stamp ids inside mapInPandas with
    the per-partition offset. The global order — hence every doc_id — depends
    only on the key ordering, not on partition boundaries, so local[8] and
    local[32] (or 1000 executors) produce identical ids.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    arranged = df.repartitionByRange(num_partitions, F.col(order_col)).sortWithinPartitions(
        order_col
    )
    arranged = arranged.cache()
    counts = (
        arranged.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    )
    offsets = {}
    acc = doc_id_base
    for row in sorted(counts, key=lambda r: r["pid"]):
        offsets[row["pid"]] = acc
        acc += row["count"]
    offsets_b = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)] + list(df.schema.fields)
    )

    def _stamp(batches):
        pid = TaskContext.get().partitionId()
        base = offsets_b.value.get(pid, 0)
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf.insert(0, "doc_id", range(base + seen, base + seen + len(pdf)))
            seen += len(pdf)
            yield pdf

    return arranged.mapInPandas(_stamp, out_schema)


def _with_analysis(df: DataFrame, schema: IndexSchema) -> DataFrame:
    """One Arrow-batched analyzer pass per text field: token count + the
    complete doc-local posting tuples (see analysis.udfs.analyzed_udf)."""
    for f in schema.text_fields:
        df = df.withColumn(
            f"{f}__an", analyzed_udf(schema.tokenizer_for(f))(F.col(f))
        )
    return df


_ANCESTORS_EXPR = (
    "transform(sequence(1, size(filter(split({col}, '/'), p -> p != ''))), "
    "i -> concat('/', array_join(slice(filter(split({col}, '/'), p -> p != ''), 1, i), '/')))"
)


def build_segment(
    spark: SparkSession,
    source: DataFrame,
    schema: IndexSchema,
    doc_id_base: int = 0,
    num_partitions: Optional[int] = None,
    work_dir: Optional[str] = None,
) -> dict:
    """Run the full build pipeline over ``source`` (one column per schema
    field, id column named per schema.id_field). Returns the segment tables.
    Pure transformation — the caller (storage layer) commits.

    ``work_dir``: staging directory for the materialize-then-derive pattern —
    the analyzed rows land in Parquet once and every derived table reads the
    columnar files back (column-pruned, JVM-only). Without it the analyzed
    rows are memory-persisted instead; at scale (and in the benchmarks) the
    staging path wins: no giant nested-struct InMemoryRelation churning the
    heap, and the tokenizer runs exactly once either way. ``dict`` and
    ``blocks`` are returned as CALLABLES over the stored postings table —
    the storage layer writes postings first and derives both from the
    written files (see storage.write_segment)."""
    sid = schema.id_field
    cols = [F.col(sid).cast("string").alias("id")]
    for f in schema.string_fields:
        cols.append(F.col(f).cast("string").alias(f))
    for f in schema.integer_fields:
        cols.append(F.col(f).cast("long").alias(f))
    for f in schema.double_fields:
        cols.append(F.col(f).cast("double").alias(f))
    for f in schema.date_fields:
        cols.append(F.col(f).cast("timestamp").alias(f))
    for f in schema.facet_fields:
        cols.append(F.col(f).cast("string").alias(f))
    for f in schema.text_fields:
        cols.append(F.col(f).cast("string").alias(f))

    projected = source.select(*cols)
    with_ids = assign_doc_ids(projected, "id", doc_id_base, num_partitions)
    if work_dir is not None:
        staged = os.path.join(work_dir, "enriched")
        _with_analysis(with_ids, schema).write.mode("overwrite").parquet(staged)
        enriched = spark.read.parquet(staged)
    else:
        enriched = _with_analysis(with_ids, schema).persist()

    # --- docs table -------------------------------------------------------
    doc_cols = [F.col("doc_id"), F.col("id")]
    for f in schema.string_fields + schema.integer_fields + schema.double_fields + schema.date_fields:
        doc_cols.append(F.col(f))
    for f in schema.facet_fields:
        doc_cols.append(F.col(f))
        doc_cols.append(
            F.expr(_ANCESTORS_EXPR.format(col=f)).alias(f"{f}__ancestors")
        )
    for f in schema.text_fields:
        doc_cols.append(F.col(f"{f}__an.norm_id").alias(f"{f}__norm"))
        doc_cols.append(F.col(f"{f}__an.len").alias(f"{f}__len"))
    docs = enriched.select(*doc_cols)

    # --- postings: pure JVM explode of the doc-local posting tuples --------
    posting_parts = []
    for f in schema.text_fields:
        exploded = (
            enriched.select(
                F.col("doc_id"),
                F.col(f"{f}__an.norm_id").alias("norm_id"),
                F.explode(F.col(f"{f}__an.posts")).alias("post"),
            )
            .select(
                F.lit(f).alias("field"),
                F.col("post.term").alias("term"),
                "doc_id",
                F.col("post.tf").alias("tf"),
                F.col("post.positions").alias("positions"),
                "norm_id",
            )
        )
        posting_parts.append(exploded)
    for f in schema.string_fields:
        # single exact case-sensitive term, no norms (src/index.rs:78-80);
        # dl=avgdl=1 ⇒ term score = idf (SURVEY.md §2.5)
        posting_parts.append(
            enriched.where(F.col(f).isNotNull()).select(
                F.lit(f).alias("field"),
                F.col(f).alias("term"),
                F.col("doc_id"),
                F.lit(1).alias("tf"),
                F.array(F.lit(0)).cast("array<int>").alias("positions"),
                F.lit(1).alias("norm_id"),
            )
        )
    for f in schema.facet_fields:
        # one posting per ancestor path → hierarchical facet matching
        posting_parts.append(
            enriched.where(F.col(f).isNotNull())
            .select(
                F.col("doc_id"),
                F.explode(F.expr(_ANCESTORS_EXPR.format(col=f))).alias("term"),
            )
            .select(
                F.lit(f).alias("field"),
                "term",
                "doc_id",
                F.lit(1).alias("tf"),
                F.array(F.lit(0)).cast("array<int>").alias("positions"),
                F.lit(1).alias("norm_id"),
            )
        )

    if posting_parts:
        postings = posting_parts[0]
        for p in posting_parts[1:]:
            postings = postings.unionByName(p)
    else:
        postings = spark.createDataFrame([], POSTINGS_SCHEMA)

    # sorted layout: term lookups prune via Parquet min/max; doc_id in the
    # range key splits Zipfian head terms across partitions instead of
    # concentrating them (skew handling, SURVEY.md §4). The range sampler and
    # the real pass each re-scan the explode — a cheap column-pruned read of
    # the staged analyzed Parquet (or of the persisted rows without staging).
    postings = postings.repartitionByRange(
        max(spark.sparkContext.defaultParallelism, 2), "field", "term", "doc_id"
    ).sortWithinPartitions("field", "term", "doc_id")

    # --- dictionary + blocks: derived from the STORED postings files -------
    # (callables over the written table; storage.write_segment invokes them
    # after the postings write so neither re-runs the build lineage)
    def derive_dict(stored: DataFrame) -> DataFrame:
        return stored.groupBy("field", "term").agg(
            F.count("*").cast("long").alias("df")
        )

    def derive_blocks(stored: DataFrame) -> DataFrame:
        from tantiny_spark.wand import build_blocks

        return build_blocks(stored)

    # one aggregation job for every field's token totals + the doc count
    agg_cols = [F.count("*").alias("__n")]
    for f in schema.text_fields:
        agg_cols.append(F.sum(F.col(f"{f}__an.len")).alias(f"__tot_{f}"))
    agg_row = enriched.agg(*agg_cols).collect()[0]
    n_docs = int(agg_row["__n"])
    stats_rows = []
    for f in schema.text_fields:
        total = int(agg_row[f"__tot_{f}"] or 0)
        stats_rows.append(
            (f, n_docs, total, (total / n_docs) if n_docs else 0.0)
        )
    for f in schema.string_fields + schema.facet_fields:
        stats_rows.append((f, n_docs, n_docs, 1.0))
    # via pandas → Arrow LocalRelation: a plain Python list would go through
    # the RDD path and spawn defaultParallelism Python workers for 2 rows
    stats = spark.createDataFrame(
        pd.DataFrame(
            stats_rows, columns=["field", "num_docs", "total_tokens", "avgdl"]
        ).astype({"num_docs": "int64", "total_tokens": "int64", "avgdl": "float64"}),
        schema="field string, num_docs long, total_tokens long, avgdl double",
    )

    return {
        "docs": docs,
        "postings": postings,
        "dict": derive_dict,  # callable(stored postings) -> DataFrame
        "stats": stats,
        "blocks": derive_blocks,  # callable(stored postings) -> DataFrame
        "n_docs": n_docs,  # already counted by the stats aggregation
    }
