"""Isolate the blocks_derive cost: Arrow transfer vs encode kernel, and
linearity between 500k and 1.5M docs.

Usage: python scripts/profile_blocks.py [cpus]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession, functions as F, types as T  # noqa: E402

from bench import corpus, build_schema  # noqa: E402
from tantiny_spark import build as B  # noqa: E402


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="blocks_prof_")
    schema = build_schema()

    def build_postings(repl, path):
        src = corpus(spark, "/root/testdata/sf0.1", repl)
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
        stream_df = with_ids.mapInPandas(
            B._flat_analyzer(schema), B._flat_stream_schema(schema)
        )
        staged = os.path.join(tmp, f"analyzed_{repl}")
        stream_df.write.mode("overwrite").parquet(staged)
        st = spark.read.parquet(staged)
        postings = st.where(F.col("field") != B.DOC_SENTINEL).select(
            "field", "term", "doc_id", "tf", "positions", "norm_id"
        )
        postings = postings.repartitionByRange(
            max(spark.sparkContext.defaultParallelism, 2), "field", "term", "doc_id"
        ).sortWithinPartitions("field", "term", "doc_id")
        postings.write.mode("overwrite").parquet(path)

    for repl in (100, 300):
        path = os.path.join(tmp, f"postings_{repl}")
        t0 = time.time()
        build_postings(repl, path)
        prep = time.time() - t0
        stored = spark.read.parquet(path)
        n = stored.count()

        # 1) pure Arrow transfer: stream every batch into pandas, do nothing
        def passthrough(batches):
            total = 0
            for pdf in batches:
                total += len(pdf)
            yield pd.DataFrame({"n": [total]})

        t0 = time.time()
        cols_no_pos = stored.select("field", "term", "doc_id", "tf", "norm_id")
        cnt = cols_no_pos.mapInPandas(
            passthrough, T.StructType([T.StructField("n", T.LongType())])
        ).agg(F.sum("n")).collect()[0][0]
        transfer = time.time() - t0

        # 2) full encode kernel
        from tantiny_spark.wand import build_blocks

        t0 = time.time()
        build_blocks(stored).write.mode("overwrite").parquet(
            os.path.join(tmp, f"blocks_{repl}")
        )
        encode = time.time() - t0
        print(
            f"repl={repl}: postings_rows={n} prep={prep:.1f}s "
            f"arrow_transfer={transfer:.1f}s full_blocks={encode:.1f}s "
            f"(rows checked: {cnt})"
        )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
