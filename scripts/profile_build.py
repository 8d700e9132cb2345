"""Phase-level build profiler — diagnose the local[32] regression.

Usage: python scripts/profile_build.py <cpus> [repl] [sf_dir]

Times each build phase separately so we can see WHERE local[32] loses
vs local[8]: doc-id assignment, analyzer+staging write, docs write,
postings repartition+write, dict/blocks derive.
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from bench import corpus, build_schema  # noqa: E402
from tantiny_spark import build as B  # noqa: E402
from tantiny_spark.storage import IndexStorage  # noqa: E402


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    extra = {k[len("SPARK_CONF_"):].replace("__", "."): v
             for k, v in os.environ.items() if k.startswith("SPARK_CONF_")}
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    b = (
        SparkSession.builder.master(master)
        .appName("profile-build")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="tantiny_prof_")
    t = {}
    try:
        src = corpus(spark, sf_dir, repl)
        n = src.count()
        schema = build_schema()

        t0 = time.time()
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
        # force the doc-id phase: count the stamped frame
        with_ids = with_ids.persist()
        with_ids.count()
        t["assign_doc_ids"] = time.time() - t0

        t0 = time.time()
        stream_df = with_ids.mapInPandas(
            B._flat_analyzer(schema), B._flat_stream_schema(schema)
        )
        staged_path = os.path.join(tmp, "analyzed")
        stream_df.write.mode("overwrite").parquet(staged_path)
        t["analyze_stage_write"] = time.time() - t0

        staged = spark.read.parquet(staged_path)
        doc_rows = staged.where(F.col("field") == B.DOC_SENTINEL)

        t0 = time.time()
        doc_rows.write.mode("overwrite").parquet(os.path.join(tmp, "docs"))
        t["docs_write"] = time.time() - t0

        t0 = time.time()
        postings = staged.where(F.col("field") != B.DOC_SENTINEL).select(
            "field", "term", "doc_id", "tf", "positions", "norm_id"
        )
        postings = postings.repartitionByRange(
            max(spark.sparkContext.defaultParallelism, 2), "field", "term", "doc_id"
        ).sortWithinPartitions("field", "term", "doc_id")
        postings.write.mode("overwrite").parquet(os.path.join(tmp, "postings"))
        t["postings_sort_write"] = time.time() - t0

        stored = spark.read.parquet(os.path.join(tmp, "postings"))
        t0 = time.time()
        stored.groupBy("field", "term").agg(F.count("*").alias("df")).write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, "dict"))
        t["dict_derive"] = time.time() - t0

        t0 = time.time()
        from tantiny_spark.wand import build_blocks

        build_blocks(stored).write.mode("overwrite").parquet(os.path.join(tmp, "blocks"))
        t["blocks_derive"] = time.time() - t0

        total = sum(t.values())
        print(f"\n=== cpus={cpus} repl={repl} n_docs={n} ===")
        for k, v in t.items():
            print(f"  {k:24s} {v:8.2f}s")
        print(f"  {'TOTAL':24s} {total:8.2f}s  ({n/total:.0f} docs/s)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
