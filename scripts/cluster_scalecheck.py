"""Fixed-work scaling probes for the standalone-cluster harness — pure Spark,
ZERO tantiny_spark code. Used to attribute the multi-executor anti-scaling
measured in BENCH/CLUSTER.md to the single-host emulation rather than the
engine (see the CLUSTER.md "Why the emulation anti-scales" section).

Probes (same input regardless of cluster size; wall should drop ~linearly
with executors if the emulation scales):
  A jvm_cpu_hash      2e9 xxhash64 evals, 64 tasks, no shuffle   (CPU)
  B jvm_shuffle_agg   1e8-row hash agg, tiny shuffle payload     (scheduler)
  C python_arrow      2e7 rows through mapInPandas numpy math    (Py workers)
  D big_shuffle       2e7 posting-shaped rows (~1.5 GB) through
                      repartitionByRange + sortWithinPartitions +
                      parquet write — the index build's layout-sort
                      shape                                      (shuffle IO)

Run via scripts/cluster_scalecheck.sh N_EXECUTORS [CORES_PER_EXEC], or
directly (local mode) with `python scripts/cluster_scalecheck.py`.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main():
    master = os.environ.get("SPARK_GRAFT_MASTER", "local[8]")
    n_exec = int(os.environ.get("SCALECHECK_EXECUTORS", "0"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = (
        SparkSession.builder.master(master).appName("cluster-scalecheck")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    if n_exec:
        for _ in range(60):
            if len(sc._jsc.sc().statusTracker().getExecutorInfos()) - 1 >= n_exec:
                break
            time.sleep(0.5)
    par = sc.defaultParallelism
    print(f"master={master} parallelism={par}", flush=True)

    def timed(label, fn, n=3):
        walls = []
        for _ in range(n):
            t0 = time.time()
            fn()
            walls.append(time.time() - t0)
        print(f"WALL {label:20s} min={min(walls):7.2f}s all=" +
              ",".join(f"{w:.2f}" for w in walls), flush=True)

    # warm: JIT + python workers
    spark.range(10**6, numPartitions=64).select(
        F.sum(F.pmod(F.xxhash64("id"), F.lit(1000)))).collect()

    # A: pure-JVM CPU-bound, no shuffle
    df = spark.range(2 * 10**9, numPartitions=64)
    timed("jvm_cpu_hash", lambda: df.select(
        F.sum(F.pmod(F.xxhash64("id", "id", "id"), F.lit(1000)))).collect())

    # B: shuffle with tiny payload (partial agg collapses it)
    df2 = spark.range(10**8, numPartitions=64)
    timed("jvm_shuffle_agg", lambda: df2.groupBy((F.col("id") % 997).alias("k"))
          .agg(F.sum(F.pmod(F.xxhash64("id"), F.lit(1000))).alias("s"))
          .select(F.sum("s")).collect())

    # C: Arrow/pandas fixed work
    def heavy(it):
        import numpy as np
        for b in it:
            v = b["id"].to_numpy(dtype="float64")
            for _ in range(50):
                v = np.sqrt(v * 1.7 + 1.0)
            yield pd.DataFrame({"id": v})

    df3 = spark.range(2 * 10**7, numPartitions=64)
    timed("python_arrow", lambda: df3.mapInPandas(heavy, "id double")
          .select(F.sum("id")).collect())

    # D: large-payload range shuffle + sort + parquet write (the index
    # build's postings-layout shape, synthetic data)
    tmp = tempfile.mkdtemp(prefix="scalecheck_")
    dfp = (
        spark.range(2 * 10**7, numPartitions=64)
        .select(
            F.lit("text").alias("field"),
            F.concat(F.lit("term"), (F.col("id") % 200000).cast("string")).alias("term"),
            F.col("id").alias("doc_id"),
            (F.col("id") % 7 + 1).alias("tf"),
            F.sequence(F.lit(0), F.col("id") % 40).alias("positions"),
        )
    )

    def big_shuffle():
        (
            dfp.repartitionByRange(max(par, 2), "field", "term", "doc_id")
            .sortWithinPartitions("field", "term", "doc_id")
            .write.mode("overwrite").parquet(tmp + "/p")
        )

    timed("big_shuffle", big_shuffle, n=1)
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
