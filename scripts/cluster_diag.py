"""Diagnose standalone-cluster overhead vs local mode: time repeated tiny
JVM-only jobs, shuffle jobs, and pandas-UDF jobs. Usage (via spark-submit
against a master, or plain python for local):

  python scripts/cluster_diag.py            # local[8]
  spark-submit --master spark://... scripts/cluster_diag.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession, functions as F  # noqa: E402


def timed(label, fn, n=5):
    walls = []
    for _ in range(n):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    print(
        f"{label:32s} " + " ".join(f"{w:7.3f}" for w in walls),
        flush=True,
    )


def main():
    master = os.environ.get("SPARK_GRAFT_MASTER", "local[8]")
    spark = (
        SparkSession.builder.master(master)
        .appName("cluster-diag")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"master={master} defaultParallelism={spark.sparkContext.defaultParallelism}", flush=True)

    timed("jvm range.count", lambda: spark.range(1000).count())
    timed("jvm shuffle groupBy", lambda: spark.range(100000).groupBy((F.col("id") % 100).alias("k")).count().count())

    @F.pandas_udf("long")
    def plus_one(s: pd.Series) -> pd.Series:
        return s + 1

    df = spark.range(100000)
    timed("pandas_udf", lambda: df.select(plus_one("id")).agg(F.sum("plus_one(id)")).collect())

    def mip(it):
        for b in it:
            yield b

    timed("mapInPandas passthrough", lambda: df.mapInPandas(mip, "id long").count())

    # import cost inside the worker: does each task pay module imports?
    def mip_import(it):
        t0 = time.time()
        import tantiny_spark  # noqa: F401
        from tantiny_spark.analysis import tokenizers  # noqa: F401
        dt = time.time() - t0
        for b in it:
            b["id"] = dt
            yield b

    timed(
        "mapInPandas import tantiny",
        lambda: df.repartition(16).mapInPandas(mip_import, "id double").agg(F.max("id")).collect(),
    )
    r = df.repartition(16).mapInPandas(mip_import, "id double").agg(F.max("id")).collect()
    print("max in-worker import time:", r, flush=True)

    # collect round-trip latency (driver RPC)
    small = spark.range(100).toDF("id")
    timed("collect tiny", lambda: small.collect())

    # parquet write+read (index build does this per segment)
    import tempfile

    d = tempfile.mkdtemp(prefix="diag_")
    timed("parquet write 100k", lambda: spark.range(100000).write.mode("overwrite").parquet(d + "/t"))
    timed("parquet read.count", lambda: spark.read.parquet(d + "/t").count())

    spark.stop()


if __name__ == "__main__":
    main()
