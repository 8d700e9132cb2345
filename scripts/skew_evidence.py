"""Skew evidence (BASELINE.md protocol item 4): per-group row-count
histograms of the postings layout BEFORE and AFTER the bucket-salting key.

The head of a Zipfian web vocabulary puts one term in nearly every document;
grouping posting encode runs by (field, term) alone would hand one task a
group the size of the corpus. The engine's encode key is
(field, term, doc_id // 8192) — wand.BUCKET_SPAN — which caps every group at
8,192 rows regardless of term frequency while keeping bucket-aligned
block-max metadata (wand.py:9-18).

This script builds the analyzer output for a replicated corpus, then prints
the group-size distribution under both keys. Output is pasted into
BENCH/BASELINE.md's skew appendix.

Usage: python scripts/skew_evidence.py [repl] [sf_dir] [cpus]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from bench import corpus, build_schema  # noqa: E402
from tantiny_spark import build as B  # noqa: E402
from tantiny_spark.wand import BUCKET_SPAN  # noqa: E402


def quantiles(df, col):
    qs = df.approxQuantile(col, [0.5, 0.9, 0.99, 1.0], 0.001)
    return {"p50": qs[0], "p90": qs[1], "p99": qs[2], "max": qs[3]}


def main():
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("skew-evidence")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = corpus(spark, sf_dir, repl)
    schema = build_schema()
    sid = schema.id_field
    cols = [F.col(sid).cast("string").alias("id")]
    for f in schema.string_fields:
        cols.append(F.col(f).cast("string").alias(f))
    for f in schema.date_fields:
        cols.append(F.col(f).cast("timestamp").alias(f))
    for f in schema.text_fields:
        cols.append(F.col(f).cast("string").alias(f))
    projected = src.select(*cols)
    with_ids = B.assign_doc_ids(projected, "id", 0, None)
    postings = (
        with_ids.mapInPandas(B._flat_analyzer(schema), B._flat_stream_schema(schema))
        .where(F.col("field") != B.DOC_SENTINEL)
        .select("field", "term", "doc_id")
        .persist()
    )
    n = postings.count()
    n_docs = with_ids.count()

    unsalted = postings.groupBy("field", "term").count().persist()
    salted = (
        postings.withColumn("bucket", (F.col("doc_id") / BUCKET_SPAN).cast("long"))
        .groupBy("field", "term", "bucket")
        .count()
        .persist()
    )
    qu, qs = quantiles(unsalted, "count"), quantiles(salted, "count")
    topu = unsalted.orderBy(F.desc("count")).limit(5).collect()
    tops = salted.orderBy(F.desc("count")).limit(5).collect()

    print(f"n_docs={n_docs:,} posting_rows={n:,} bucket_span={BUCKET_SPAN}")
    print(f"groups (field,term):          {unsalted.count():,}  "
          f"p50={qu['p50']:.0f} p90={qu['p90']:.0f} p99={qu['p99']:.0f} "
          f"MAX={qu['max']:,.0f}")
    print(f"groups (field,term,bucket):   {salted.count():,}  "
          f"p50={qs['p50']:.0f} p90={qs['p90']:.0f} p99={qs['p99']:.0f} "
          f"MAX={qs['max']:,.0f}")
    print("top-5 unsalted groups: " +
          ", ".join(f"{r['term']}={r['count']:,}" for r in topu))
    print("top-5 salted groups:   " +
          ", ".join(f"{r['term']}[b{r['bucket']}]={r['count']:,}" for r in tops))
    print(f"max group shrink: {qu['max'] / max(qs['max'], 1):.1f}x "
          f"(cap = min(corpus, {BUCKET_SPAN}) per group)")
    spark.stop()


if __name__ == "__main__":
    main()
